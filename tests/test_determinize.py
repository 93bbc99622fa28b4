"""Lattice determinization: per word sequence exactly one path must
survive, carrying the minimum-cost weight and that path's transition-id
alignment; output must be deterministic and epsilon-free; the full
path-set semantics (word-seq -> best cost) must be preserved exactly.
Checked on hand-built lattices, random acyclic lattices vs brute-force
path enumeration, and real decoder output."""

import numpy as np
import pytest

from kaldi_lstm_tpu.decode.determinize import (
    DeterminizeError,
    determinize_lattice,
)
from kaldi_lstm_tpu.io.lattice import (
    CompactLattice,
    Lattice,
    LatticeArc,
    lattice_best_path,
)


def _enum_paths_lat(lat: Lattice):
    """{word-tuple: best (total, graph, tids)} over all full paths."""
    best = {}

    def dfs(s, g, a, words, tids):
        fin = lat.final.get(s)
        if fin is not None:
            key = tuple(words)
            cand = (g + fin[0] + a + fin[1], g + fin[0], tuple(tids))
            cur = best.get(key)
            if cur is None or cand < cur:
                best[key] = cand
        for arc in lat.arcs[s]:
            dfs(arc.dst, g + arc.graph_cost, a + arc.acoustic_cost,
                words + ([arc.olabel] if arc.olabel else []),
                tids + ([arc.ilabel] if arc.ilabel else []))

    dfs(lat.start, 0.0, 0.0, [], [])
    return best


def _enum_paths_clat(clat: CompactLattice):
    best = {}

    def dfs(s, g, a, words, tids):
        fin = clat.final.get(s)
        if fin is not None:
            key = tuple(words)
            cand = (g + fin[0] + a + fin[1], g + fin[0],
                    tuple(tids) + tuple(fin[2]))
            cur = best.get(key)
            if cur is None or cand < cur:
                best[key] = cand
        for arc in clat.arcs[s]:
            dfs(arc.dst, g + arc.graph_cost, a + arc.acoustic_cost,
                words + [arc.label], tids + list(arc.tids))

    dfs(clat.start, 0.0, 0.0, [], [])
    return best


def _check_deterministic(clat: CompactLattice):
    for arcs in clat.arcs:
        labels = [a.label for a in arcs]
        assert 0 not in labels, "epsilon arc in determinized lattice"
        assert len(labels) == len(set(labels)), \
            f"duplicate out-labels {labels}"


def test_two_alignments_one_survives():
    # states 0 -> {1a via tids (1,2), 1b via tids (3,4)} -> final; same
    # word 7 on both, second alignment cheaper
    lat = Lattice()
    for _ in range(4):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(1, 7, 1.0, 2.0, 1))   # cost 3.0
    lat.arcs[1].append(LatticeArc(2, 0, 0.0, 0.5, 3))
    lat.arcs[0].append(LatticeArc(3, 7, 0.5, 1.0, 2))   # cost 1.5
    lat.arcs[2].append(LatticeArc(4, 0, 0.0, 0.5, 3))
    lat.final[3] = (0.0, 0.0)
    clat = determinize_lattice(lat)
    _check_deterministic(clat)
    paths = _enum_paths_clat(clat)
    assert set(paths) == {(7,)}
    total, _, tids = paths[(7,)]
    assert total == pytest.approx(2.0)
    assert tids == (3, 4)


def test_epsilon_paths_removed_and_merged():
    # 0 -eps-> 1 -w-> 2(final), and 0 -w-> 2 directly with higher cost
    lat = Lattice()
    for _ in range(3):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(5, 0, 0.1, 0.1, 1))
    lat.arcs[1].append(LatticeArc(6, 9, 0.1, 0.1, 2))
    lat.arcs[0].append(LatticeArc(7, 9, 5.0, 5.0, 2))
    lat.final[2] = (0.0, 0.0)
    clat = determinize_lattice(lat)
    _check_deterministic(clat)
    paths = _enum_paths_clat(clat)
    assert set(paths) == {(9,)}
    total, _, tids = paths[(9,)]
    assert total == pytest.approx(0.4)
    assert tids == (5, 6)


def _random_lattice(rng, ns=14, nwords=4, ntids=9, p_final=0.35):
    lat = Lattice()
    for _ in range(ns):
        lat.add_state()
    for s in range(ns - 1):
        for _ in range(rng.randint(1, 4)):
            dst = rng.randint(s + 1, ns)
            lat.arcs[s].append(LatticeArc(
                int(rng.randint(0, ntids + 1)),
                int(rng.randint(0, nwords + 1)),   # 0 = epsilon word
                round(float(rng.rand()), 3),
                round(float(rng.rand()), 3), int(dst)))
        if rng.rand() < p_final and s > 0:
            lat.final[s] = (round(float(rng.rand()), 3), 0.0)
    lat.final[ns - 1] = (0.0, 0.0)
    return lat


def test_random_lattices_path_semantics_preserved():
    rng = np.random.RandomState(0)
    for trial in range(25):
        lat = _random_lattice(rng)
        want = _enum_paths_lat(lat)
        clat = determinize_lattice(lat)
        _check_deterministic(clat)
        got = _enum_paths_clat(clat)
        assert set(got) == set(want), f"trial {trial}: word-seq sets"
        for k in want:
            assert got[k][0] == pytest.approx(want[k][0], abs=1e-9), \
                f"trial {trial}: cost of {k}"
            assert got[k][1] == pytest.approx(want[k][1], abs=1e-9), \
                f"trial {trial}: graph part of {k}"


def test_best_path_agrees():
    rng = np.random.RandomState(1)
    for _ in range(10):
        lat = _random_lattice(rng)
        w0, _, c0 = lattice_best_path(lat)
        clat = determinize_lattice(lat)
        w1, _, c1 = lattice_best_path(clat)
        assert w1 == w0
        assert c1 == pytest.approx(c0, abs=1e-6)


def test_cycle_and_blowup_guards():
    lat = Lattice()
    for _ in range(2):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(1, 1, 0.1, 0.1, 1))
    lat.arcs[1].append(LatticeArc(2, 2, 0.1, 0.1, 0))
    lat.final[1] = (0.0, 0.0)
    with pytest.raises(DeterminizeError, match="cycle"):
        determinize_lattice(lat)

    rng = np.random.RandomState(2)
    big = _random_lattice(rng, ns=30, nwords=6)
    with pytest.raises(DeterminizeError, match="max_states"):
        determinize_lattice(big, max_states=2)


def test_real_decoder_lattice_roundtrip(tmp_path):
    from tests.test_word_decode import _emit, _oracle_setup
    from kaldi_lstm_tpu.decode.graph import build_decoding_graph
    from kaldi_lstm_tpu.decode.lattice_faster import decode_lattice_faster
    from kaldi_lstm_tpu.io.lattice import (
        LatticeWriter,
        SequentialLatticeReader,
    )
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence

    lex, lm, tm, means, rng = _oracle_setup(num_words=6, seed=11)
    graph = build_decoding_graph(tm, lex, lm)
    ark = tmp_path / "det.ark"
    with LatticeWriter(f"ark:{ark}") as w:
        for u in range(3):
            sent = sample_sentence(rng, lm, sorted(lex), 6) or ["w000"]
            ll = _emit(tm, lex, means, rng, sent, noise=0.8)
            raw = decode_lattice_faster(graph, ll, acoustic_scale=1.0,
                                        beam=16.0, lattice_beam=8.0)
            det = determinize_lattice(raw)
            _check_deterministic(det)
            # exact path-semantics equality on the real lattice
            want = _enum_paths_lat(raw)
            got = _enum_paths_clat(det)
            assert set(got) == set(want)
            for k in want:
                assert got[k][0] == pytest.approx(want[k][0], abs=1e-6)
            w.write(f"utt{u}", det)
    # round-trip through the wire format
    n = 0
    for key, lat2 in SequentialLatticeReader(f"ark:{ark}"):
        _check_deterministic(lat2)
        n += 1
    assert n == 3
