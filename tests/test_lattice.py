"""Lattice I/O (OpenFst/Kaldi wire formats) + the lattice-generating
decoder. The decoder is cross-checked against decode_faster (the
best path through the lattice must be the Viterbi path), and the binary
format against an independent raw-bytes parser (conformance guard in the
spirit of tests/test_wire_conformance.py)."""

import math
import struct

import numpy as np
import pytest

from kaldi_lstm_tpu.decode.faster import decode_faster
from kaldi_lstm_tpu.decode.graph import build_decoding_graph
from kaldi_lstm_tpu.decode.lattice_faster import decode_lattice_faster
from kaldi_lstm_tpu.io.lattice import (
    FST_MAGIC,
    CompactLattice,
    CompactLatticeArc,
    Lattice,
    LatticeArc,
    LatticeWriter,
    SequentialLatticeReader,
    compact_lattice_to_bytes,
    compact_lattice_to_text,
    compact_to_lattice,
    lattice_best_path,
    lattice_from_text,
    lattice_scale,
    lattice_to_bytes,
    lattice_to_compact,
    lattice_to_text,
    read_lattice_binary,
)

from tests.test_word_decode import _emit, _oracle_setup


def _sample_lattice() -> Lattice:
    """0 -(tid 3, word 7)-> 1 -(tid 4)-> 2(final); 0 -(tid 5, word 8)-> 2."""
    lat = Lattice()
    for _ in range(3):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(3, 7, 0.5, 1.25, 1))
    lat.arcs[0].append(LatticeArc(5, 8, 2.0, 3.5, 2))
    lat.arcs[1].append(LatticeArc(4, 0, 0.25, 0.75, 2))
    lat.final[2] = (0.125, 0.0)
    return lat


def _sample_compact() -> CompactLattice:
    clat = CompactLattice()
    for _ in range(3):
        clat.add_state()
    clat.arcs[0].append(CompactLatticeArc(7, 0.5, 1.25, (3, 4), 1))
    clat.arcs[0].append(CompactLatticeArc(8, 2.0, 3.5, (5,), 2))
    clat.arcs[1].append(CompactLatticeArc(0, 0.0, 0.0, (), 2))
    clat.final[2] = (0.125, 0.0, (9,))
    return clat


def _assert_lat_equal(a: Lattice, b: Lattice):
    assert a.start == b.start and a.num_states == b.num_states
    for s in range(a.num_states):
        assert len(a.arcs[s]) == len(b.arcs[s])
        for x, y in zip(a.arcs[s], b.arcs[s]):
            assert (x.ilabel, x.olabel, x.dst) == (y.ilabel, y.olabel,
                                                   y.dst)
            assert abs(x.graph_cost - y.graph_cost) < 1e-5
            assert abs(x.acoustic_cost - y.acoustic_cost) < 1e-5
    assert set(a.final) == set(b.final)
    for s in a.final:
        assert np.allclose(a.final[s], b.final[s], atol=1e-5)


def _assert_clat_equal(a: CompactLattice, b: CompactLattice):
    assert a.start == b.start and a.num_states == b.num_states
    for s in range(a.num_states):
        assert len(a.arcs[s]) == len(b.arcs[s])
        for x, y in zip(a.arcs[s], b.arcs[s]):
            assert (x.label, x.tids, x.dst) == (y.label, y.tids, y.dst)
            assert abs(x.graph_cost - y.graph_cost) < 1e-5
            assert abs(x.acoustic_cost - y.acoustic_cost) < 1e-5
    assert set(a.final) == set(b.final)
    for s in a.final:
        ga, aa, ta = a.final[s]
        gb, ab, tb = b.final[s]
        assert ta == tb and abs(ga - gb) < 1e-5 and abs(aa - ab) < 1e-5


# ---------------------------------------------------------------------------
# wire formats
# ---------------------------------------------------------------------------

def test_lattice_binary_roundtrip():
    import io
    lat = _sample_lattice()
    raw = lattice_to_bytes(lat)
    back = read_lattice_binary(io.BytesIO(raw))
    assert isinstance(back, Lattice)
    _assert_lat_equal(lat, back)


def test_compact_lattice_binary_roundtrip():
    import io
    clat = _sample_compact()
    raw = compact_lattice_to_bytes(clat)
    back = read_lattice_binary(io.BytesIO(raw))
    assert isinstance(back, CompactLattice)
    _assert_clat_equal(clat, back)


def test_binary_conformance_raw_bytes():
    """Independent struct-level walk of the OpenFst VectorFst layout
    (fst.cc FstHeader::Write + vector-fst.h WriteFst): every field at
    its documented offset, little-endian."""
    lat = _sample_lattice()
    raw = lattice_to_bytes(lat)
    off = 0

    def i32():
        nonlocal off
        v = struct.unpack_from("<i", raw, off)[0]
        off += 4
        return v

    def i64():
        nonlocal off
        v = struct.unpack_from("<q", raw, off)[0]
        off += 8
        return v

    def f32():
        nonlocal off
        v = struct.unpack_from("<f", raw, off)[0]
        off += 4
        return v

    def s():
        n = i32()
        nonlocal off
        v = raw[off:off + n].decode()
        off += n
        return v

    assert i32() == FST_MAGIC == 2125659606
    assert s() == "vector"
    assert s() == "lattice4"
    assert i32() == 2                      # VectorFst file version
    assert i32() == 0                      # flags: no symbol tables
    struct.unpack_from("<Q", raw, off); off += 8   # properties
    assert i64() == 0                      # start
    assert i64() == 3                      # numstates
    assert i64() == 3                      # numarcs
    # state 0: non-final (inf, inf), 2 arcs
    assert math.isinf(f32()) and math.isinf(f32())
    assert i64() == 2
    assert i32() == 3 and i32() == 7       # ilabel, olabel
    assert abs(f32() - 0.5) < 1e-6 and abs(f32() - 1.25) < 1e-6
    assert i32() == 1                      # nextstate
    off += 4 + 4 + 4 + 4 + 4               # arc 0->2
    # state 1: 1 arc; state 2: final (0.125, 0), 0 arcs
    assert math.isinf(f32()) and math.isinf(f32())
    assert i64() == 1
    off += 20
    assert abs(f32() - 0.125) < 1e-6 and f32() == 0.0
    assert i64() == 0
    assert off == len(raw)


def test_text_roundtrip_both_types():
    lat = _sample_lattice()
    back = lattice_from_text(lattice_to_text(lat).splitlines())
    assert isinstance(back, Lattice)
    _assert_lat_equal(lat, back)
    clat = _sample_compact()
    backc = lattice_from_text(
        compact_lattice_to_text(clat).splitlines())
    assert isinstance(backc, CompactLattice)
    _assert_clat_equal(clat, backc)


def test_conversions_preserve_best_path():
    lat = _sample_lattice()
    w1, t1, c1 = lattice_best_path(lat)
    clat = lattice_to_compact(lat)
    w2, t2, c2 = lattice_best_path(clat)
    assert w1 == w2 and t1 == t2 and abs(c1 - c2) < 1e-6
    lat2 = compact_to_lattice(clat)
    w3, t3, c3 = lattice_best_path(lat2)
    assert w1 == w3 and t1 == t3 and abs(c1 - c3) < 1e-6
    # multi-tid compact arcs expand through inserted states
    lat3 = compact_to_lattice(_sample_compact())
    w4, t4, c4 = lattice_best_path(lat3)
    w5, t5, c5 = lattice_best_path(_sample_compact())
    assert w4 == w5 and t4 == t5 and abs(c4 - c5) < 1e-6


def test_lattice_scale():
    lat = lattice_scale(_sample_lattice(), lm_scale=2.0,
                        acoustic_scale=0.5)
    assert abs(lat.arcs[0][0].graph_cost - 1.0) < 1e-9
    assert abs(lat.arcs[0][0].acoustic_cost - 0.625) < 1e-9
    assert abs(lat.final[2][0] - 0.25) < 1e-9


def test_ark_roundtrip(tmp_path):
    lats = {"utt1": _sample_lattice(), "utt2": _sample_lattice()}
    for mode, spec in (("binary", "ark:"), ("text", "ark,t:")):
        path = f"{spec}{tmp_path}/{mode}.lats"
        with LatticeWriter(path, compact=True) as w:
            for k, v in lats.items():
                w.write(k, v)
        got = dict(SequentialLatticeReader(
            f"ark:{tmp_path}/{mode}.lats"))
        assert sorted(got) == ["utt1", "utt2"]
        for k, v in lats.items():
            assert isinstance(got[k], CompactLattice)
            _assert_clat_equal(lattice_to_compact(v), got[k])
    # raw (non-compact) ark
    with LatticeWriter(f"ark:{tmp_path}/raw.lats", compact=False) as w:
        w.write("u", _sample_lattice())
    (k, back), = list(SequentialLatticeReader(f"ark:{tmp_path}/raw.lats"))
    assert k == "u" and isinstance(back, Lattice)
    _assert_lat_equal(_sample_lattice(), back)


# ---------------------------------------------------------------------------
# lattice-generating decoder
# ---------------------------------------------------------------------------

def test_lattice_best_path_matches_viterbi():
    """The best path through the generated lattice IS the Viterbi path:
    same words, same total score (negated cost), on plain and
    optional-silence graphs."""
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    lex, lm, tm, means, rng = _oracle_setup(num_words=8, seed=5)
    for sil in (0.0, 0.3):
        graph = build_decoding_graph(
            tm, lex, lm, sil_phone=1 if sil else 0, sil_prob=sil)
        for _ in range(6):
            sent = sample_sentence(rng, lm, sorted(lex), 7) or ["w000"]
            loglik = _emit(tm, lex, means, rng, sent, noise=0.6,
                           sil_prob=sil)
            ref = decode_faster(graph, loglik, 1.0, beam=14.0)
            lat = decode_lattice_faster(graph, loglik, 1.0, beam=14.0,
                                        lattice_beam=7.0)
            words, tids, cost = lattice_best_path(lat)
            assert abs(-cost - ref.score) < 1e-6
            assert words == ref.words
            assert len(tids) == loglik.shape[0]  # one tid per frame


def test_lattice_beam_grows_lattice():
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    lex, lm, tm, means, rng = _oracle_setup(num_words=8, seed=7)
    graph = build_decoding_graph(tm, lex, lm)
    sent = sample_sentence(rng, lm, sorted(lex), 7) or ["w000"]
    loglik = _emit(tm, lex, means, rng, sent, noise=0.8)
    sizes = [decode_lattice_faster(graph, loglik, 1.0, beam=16.0,
                                   lattice_beam=b).num_arcs()
             for b in (0.5, 4.0, 10.0)]
    assert sizes[0] <= sizes[1] <= sizes[2]
    assert sizes[2] > sizes[0]  # wider beam keeps real alternatives


def test_lattice_all_paths_within_beam():
    """Every complete path in the pruned lattice scores within
    lattice_beam of the best (the defining property of latgen's
    --lattice-beam), checked by exhaustive DFS on a small lattice."""
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    lex, lm, tm, means, rng = _oracle_setup(num_words=6, seed=9)
    graph = build_decoding_graph(tm, lex, lm)
    sent = sample_sentence(rng, lm, sorted(lex), 4) or ["w000"]
    loglik = _emit(tm, lex, means, rng, sent, noise=0.7)
    lat_beam = 5.0
    lat = decode_lattice_faster(graph, loglik, 1.0, beam=14.0,
                                lattice_beam=lat_beam)
    _w, _t, best = lattice_best_path(lat)

    # forward max + backward max via Bellman-Ford-ish relaxation
    n = lat.num_states
    dist = np.full(n, np.inf)
    dist[lat.start] = 0.0
    for _ in range(n):
        changed = False
        for s in range(n):
            if not np.isfinite(dist[s]):
                continue
            for a in lat.arcs[s]:
                nd = dist[s] + a.graph_cost + a.acoustic_cost
                if nd < dist[a.dst] - 1e-12:
                    dist[a.dst] = nd
                    changed = True
        if not changed:
            break
    tocost = np.full(n, np.inf)
    for s, (g, ac) in lat.final.items():
        tocost[s] = g + ac
    for _ in range(n):
        changed = False
        for s in range(n):
            for a in lat.arcs[s]:
                nd = a.graph_cost + a.acoustic_cost + tocost[a.dst]
                if nd < tocost[s] - 1e-12:
                    tocost[s] = nd
                    changed = True
        if not changed:
            break
    # every arc lies on some complete path within the beam
    for s in range(n):
        for a in lat.arcs[s]:
            through = dist[s] + a.graph_cost + a.acoustic_cost \
                + tocost[a.dst]
            assert through <= best + lat_beam + 1e-6
    # and the reference transcript survives in the lattice word set
    assert all(np.isfinite(tocost[s]) or not lat.arcs[s]
               for s in range(n))


def test_latgen_cli_pipeline(tmp_path, capsys):
    """latgen_faster -> (lattice_copy text roundtrip) ->
    lattice_best_path -> compute_wer, end to end on oracle loglik."""
    from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter, \
        SequentialMatrixReader
    from kaldi_lstm_tpu.io.transition_model import TransitionModel
    from kaldi_lstm_tpu.tools import (compute_wer, latgen_faster,
                                      lattice_best_path as lbp_tool,
                                      lattice_copy, make_word_synth_data)
    d = str(tmp_path)
    assert make_word_synth_data.main(
        ["--dir", d, "--num-words", "6", "--num-phones", "8",
         "--num-utts", "10", "--feat-dim", "16",
         "--emission-noise", "0.25", "--max-words", "6"]) == 0
    tm = TransitionModel.load(f"{d}/final.mdl")
    means = np.random.RandomState(42).randn(tm.num_pdfs, 16)
    with MatrixWriter(f"ark:{d}/loglik.ark") as w:
        for key, feats in SequentialMatrixReader(f"scp:{d}/feats.scp"):
            d2 = ((feats[:, None, :].astype(np.float64)
                   - means[None, :, :]) ** 2).sum(-1)
            w.write(key, (-0.5 * d2 / 0.25 ** 2).astype(np.float32))
    assert latgen_faster.main(
        [f"{d}/final.mdl", f"{d}/lexicon.txt", f"{d}/lm.arpa",
         f"ark:{d}/loglik.ark", f"ark:{d}/lat.ark",
         "--acoustic-scale", "1.0", "--beam", "20",
         "--lattice-beam", "7"]) == 0
    # binary -> text -> binary survives
    assert lattice_copy.main([f"ark:{d}/lat.ark",
                              f"ark,t:{d}/lat.txt.ark"]) == 0
    assert lattice_copy.main([f"ark:{d}/lat.txt.ark",
                              f"ark:{d}/lat2.ark"]) == 0
    a = dict(SequentialLatticeReader(f"ark:{d}/lat.ark"))
    b = dict(SequentialLatticeReader(f"ark:{d}/lat2.ark"))
    assert sorted(a) == sorted(b)
    for k in a:
        _assert_clat_equal(a[k], b[k])
    assert lbp_tool.main(
        [f"ark:{d}/lat2.ark", f"ark,t:{d}/hyp.txt",
         "--alignment-wspecifier", f"ark,t:{d}/ali.txt",
         "--word-symbol-table", f"{d}/words.txt"]) == 0
    assert compute_wer.main([f"{d}/text", f"{d}/hyp.txt"]) == 0
    out = capsys.readouterr().out
    wer = float(out.split("%WER ")[1].split()[0])
    assert wer <= 2.0, out
    # alignments: one transition-id per frame
    frames = {k: m.shape[0] for k, m in
              SequentialMatrixReader(f"ark:{d}/loglik.ark")}
    with open(f"{d}/ali.txt") as f:
        for line in f:
            key, *tids = line.split()
            assert len(tids) == frames[key]
            assert all(int(t) > 0 for t in tids)


# ---------------------------------------------------------------------------
# N-best
# ---------------------------------------------------------------------------

def test_nbest_ordering_and_completeness():
    """N-best on a hand-built diamond: exact costs, true order, and the
    1-best equals lattice_best_path."""
    from kaldi_lstm_tpu.io.lattice import lattice_nbest
    lat = Lattice()
    for _ in range(4):
        lat.add_state()
    # three paths: 0-1-3 (cost 1.0, word 5), 0-2-3 (cost 1.5, word 6),
    # 0-3 direct (cost 3.0, word 7)
    lat.arcs[0].append(LatticeArc(1, 5, 0.5, 0.0, 1))
    lat.arcs[1].append(LatticeArc(2, 0, 0.5, 0.0, 3))
    lat.arcs[0].append(LatticeArc(1, 6, 1.0, 0.0, 2))
    lat.arcs[2].append(LatticeArc(2, 0, 0.5, 0.0, 3))
    lat.arcs[0].append(LatticeArc(3, 7, 3.0, 0.0, 3))
    lat.final[3] = (0.0, 0.0)
    paths = lattice_nbest(lat, 5)
    assert len(paths) == 3
    costs = [c for _w, _t, c in paths]
    assert costs == sorted(costs)
    assert np.allclose(costs, [1.0, 1.5, 3.0])
    assert [w for w, _t, _c in paths] == [[5], [6], [7]]
    w1, t1, c1 = lattice_best_path(lat)
    assert paths[0][0] == w1 and paths[0][1] == t1 \
        and abs(paths[0][2] - c1) < 1e-9


def test_nbest_final_state_with_continuation():
    """A final state whose continuation is cheaper than finishing: the
    completion event must still pop in exact total order."""
    from kaldi_lstm_tpu.io.lattice import lattice_nbest
    lat = Lattice()
    for _ in range(2):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(1, 1, 0.1, 0.0, 1))  # continue: cheap
    lat.final[0] = (2.0, 0.0)                          # finish at 0: dear
    lat.final[1] = (0.0, 0.0)
    paths = lattice_nbest(lat, 2)
    assert np.allclose([c for _w, _t, c in paths], [0.1, 2.0])
    assert paths[0][0] == [1] and paths[1][0] == []


def test_nbest_on_decoder_lattice():
    """On a real decoded lattice: n-best costs are nondecreasing, within
    lattice_beam of the best, and the 1-best is the Viterbi path."""
    from kaldi_lstm_tpu.io.lattice import lattice_nbest
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    lex, lm, tm, means, rng = _oracle_setup(num_words=8, seed=13)
    graph = build_decoding_graph(tm, lex, lm)
    sent = sample_sentence(rng, lm, sorted(lex), 6) or ["w000"]
    loglik = _emit(tm, lex, means, rng, sent, noise=0.8)
    lat = decode_lattice_faster(graph, loglik, 1.0, beam=16.0,
                                lattice_beam=6.0)
    ref = decode_faster(graph, loglik, 1.0, beam=16.0)
    paths = lattice_nbest(lat, 8)
    costs = [c for _w, _t, c in paths]
    assert costs == sorted(costs)
    assert abs(-costs[0] - ref.score) < 1e-6
    assert paths[0][0] == ref.words
    # (complete paths may exceed best + lattice_beam: the beam is an
    # arc-level guarantee — see test_lattice_all_paths_within_beam)
    # works on the compact form too, same results
    cpaths = lattice_nbest(lattice_to_compact(lat), 8)
    assert np.allclose([c for _w, _t, c in cpaths], costs)
    assert [w for w, _t, _c in cpaths] == [w for w, _t, _c in paths]
