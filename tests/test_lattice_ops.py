"""lattice_prune and lattice_lmrescore, pinned against brute-force
path enumeration and against re-decoding with the new LM."""

import numpy as np
import pytest

from kaldi_lstm_tpu.io.lattice import (
    CompactLattice,
    Lattice,
    LatticeArc,
    lattice_best_path,
    lattice_lmrescore,
    lattice_prune,
    lattice_to_compact,
)


def _paths(lat, compact=False):
    """[(words, total_cost)] over all complete paths."""
    out = []

    def dfs(s, words, cost):
        fin = lat.final.get(s)
        if fin is not None:
            out.append((tuple(words), cost + fin[0] + fin[1]))
        for a in lat.arcs[s]:
            w = a.label if compact else a.olabel
            dfs(a.dst, words + ([w] if w else []),
                cost + a.graph_cost + a.acoustic_cost)

    dfs(lat.start, [], 0.0)
    return out


def _random_lattice(rng, ns=12, nwords=4):
    lat = Lattice()
    for _ in range(ns):
        lat.add_state()
    for s in range(ns - 1):
        for _ in range(rng.randint(1, 4)):
            lat.arcs[s].append(LatticeArc(
                int(rng.randint(0, 3)),
                int(rng.randint(0, nwords + 1)),
                round(float(rng.rand() * 2), 3),
                round(float(rng.rand() * 2), 3),
                int(rng.randint(s + 1, ns))))
        if s > 0 and rng.rand() < 0.3:
            lat.final[s] = (round(float(rng.rand()), 3), 0.0)
    lat.final[ns - 1] = (0.0, 0.0)
    return lat


def _alpha_beta(lat):
    """Independent forward/backward best-cost arrays (plain loops over
    states in index order — _random_lattice only has forward arcs)."""
    n = lat.num_states
    alpha = np.full(n, np.inf)
    alpha[lat.start] = 0.0
    for s in range(n):
        for a in lat.arcs[s]:
            alpha[a.dst] = min(alpha[a.dst],
                               alpha[s] + a.graph_cost + a.acoustic_cost)
    beta = np.full(n, np.inf)
    for s, fin in lat.final.items():
        beta[s] = fin[0] + fin[1]
    for s in range(n - 1, -1, -1):
        for a in lat.arcs[s]:
            beta[s] = min(beta[s],
                          a.graph_cost + a.acoustic_cost + beta[a.dst])
    return alpha, beta


def test_prune_arc_criterion_and_path_properties():
    rng = np.random.RandomState(0)
    for compact in (False, True):
        for _ in range(15):
            lat = _random_lattice(rng)
            clat = lattice_to_compact(lat) if compact else lat
            paths = _paths(clat, compact)
            pathset = {(p, round(c, 6)) for p, c in paths}
            best = min(c for _, c in paths)
            alpha, beta = _alpha_beta(clat)
            for beam in (0.5, 1.5, 4.0):
                cutoff = best + beam
                pruned = lattice_prune(clat, beam)
                # exactly the arcs whose best path through them is
                # within the beam survive (upstream PruneLattice)
                want_arcs = sum(
                    1 for s in range(clat.num_states)
                    for a in clat.arcs[s]
                    if alpha[s] + a.graph_cost + a.acoustic_cost
                    + beta[a.dst] <= cutoff + 1e-9)
                assert pruned.num_arcs() == want_arcs
                got = _paths(pruned, compact)
                # every in-beam path survives with identical cost; all
                # survivors are genuine original paths
                for p, c in paths:
                    if c <= cutoff + 1e-9:
                        assert (p, round(c, 6)) in {
                            (q, round(d, 6)) for q, d in got}
                for q, d in got:
                    assert (q, round(d, 6)) in pathset
                # best path untouched
                w0, _, c0 = lattice_best_path(clat)
                w1, _, c1 = lattice_best_path(pruned)
                assert w1 == w0 and abs(c1 - c0) < 1e-9


def test_prune_raises_without_complete_path():
    lat = Lattice()
    lat.add_state()
    lat.add_state()
    lat.arcs[0].append(LatticeArc(1, 1, 0.1, 0.1, 1))
    # no final state at all
    with pytest.raises(ValueError, match="complete path"):
        lattice_prune(lat, 5.0)


def test_lmrescore_exact_against_enumeration():
    """Decode with LM_A, rescore to LM_B: every path's new total cost
    must equal old total - LM_A(words+eos) + LM_B(words+eos)."""
    from kaldi_lstm_tpu.decode.graph import build_decoding_graph
    from kaldi_lstm_tpu.decode.lattice_faster import decode_lattice_faster
    from kaldi_lstm_tpu.tools.make_word_synth_data import (
        make_language,
        sample_sentence,
    )
    from tests.test_word_decode import _emit, _oracle_setup

    lex, lm_a, tm, means, rng = _oracle_setup(num_words=5, seed=17)
    lm_b = make_language(np.random.RandomState(99), 5, 8, 2, 3,
                         eos_prob=0.3)[1]
    # same vocab: rebuild lm_b over lex's words
    assert sorted(set(lm_b.vocab) - {"<s>", "</s>"}) \
        == sorted(set(lm_a.vocab) - {"<s>", "</s>"})
    graph = build_decoding_graph(tm, lex, lm_a)
    words = graph.words

    def arpa_score(lm, seq):
        h = "<s>"
        tot = 0.0
        for w in seq:
            tot += lm.logp(h, words.id2sym[w])
            h = words.id2sym[w]
        return tot + lm.logp(h, "</s>")

    for _ in range(4):
        sent = sample_sentence(rng, lm_a, sorted(lex), 5) or ["w000"]
        ll = _emit(tm, lex, means, rng, sent, noise=0.7)
        raw = decode_lattice_faster(graph, ll, acoustic_scale=1.0,
                                    beam=14.0, lattice_beam=7.0)
        res = lattice_lmrescore(raw, lm_a, lm_b, words)
        old = {}
        for p, c in _paths(raw):
            old[p] = min(old.get(p, np.inf), c)
        new = {}
        for p, c in _paths(res):
            new[p] = min(new.get(p, np.inf), c)
        assert set(new) == set(old)
        for p in old:
            want = old[p] + arpa_score(lm_a, p) - arpa_score(lm_b, p)
            np.testing.assert_allclose(new[p], want, atol=1e-9)


def test_lmrescore_best_path_matches_direct_decode():
    """Rescored best path == decoding directly with the new LM (oracle
    acoustics, wide beams, determinized input)."""
    from kaldi_lstm_tpu.decode.determinize import determinize_lattice
    from kaldi_lstm_tpu.decode.graph import build_decoding_graph
    from kaldi_lstm_tpu.decode.lattice_faster import decode_lattice_faster
    from kaldi_lstm_tpu.decode.faster import decode_faster
    from kaldi_lstm_tpu.tools.make_word_synth_data import (
        make_language,
        sample_sentence,
    )
    from tests.test_word_decode import _emit, _oracle_setup

    lex, lm_a, tm, means, rng = _oracle_setup(num_words=5, seed=19)
    lm_b = make_language(np.random.RandomState(7), 5, 8, 2, 3,
                         eos_prob=0.3)[1]
    graph_a = build_decoding_graph(tm, lex, lm_a)
    graph_b = build_decoding_graph(tm, lex, lm_b,
                                   words=graph_a.words)

    for _ in range(4):
        sent = sample_sentence(rng, lm_a, sorted(lex), 5) or ["w000"]
        ll = _emit(tm, lex, means, rng, sent, noise=0.8)
        raw = decode_lattice_faster(graph_a, ll, acoustic_scale=1.0,
                                    beam=20.0, lattice_beam=12.0)
        det = determinize_lattice(raw)
        res = lattice_lmrescore(det, lm_a, lm_b, graph_a.words)
        w_resc, _, c_resc = lattice_best_path(res)
        ref = decode_faster(graph_b, ll, acoustic_scale=1.0, beam=20.0)
        assert w_resc == ref.words
        np.testing.assert_allclose(c_resc, -ref.score, atol=1e-6)


def _write_trigram_arpa(path, rng, vocab):
    """Hand-construct a (not necessarily normalized) trigram ARPA over
    `vocab` — probabilities only need to be well-defined for the test."""
    import itertools as it
    lines = ["\\data\\", f"ngram 1={len(vocab) + 2}"]
    uni, bi, tri = {}, {}, {}
    full = list(vocab) + ["</s>"]
    for w in ["<s>"] + full:
        uni[w] = (round(-1 - rng.rand(), 4), round(-0.5 * rng.rand(), 4))
    for v, w in it.product(["<s>"] + list(vocab), full):
        if rng.rand() < 0.6:
            bi[(v, w)] = (round(-1 - rng.rand(), 4),
                          round(-0.5 * rng.rand(), 4))
    for u, v, w in it.product(["<s>"] + list(vocab), list(vocab), full):
        if (u, v) in bi and rng.rand() < 0.4:
            tri[(u, v, w)] = round(-1 - rng.rand(), 4)
    lines += [f"ngram 2={len(bi)}", f"ngram 3={len(tri)}", "",
              "\\1-grams:"]
    for w, (lp, bo) in uni.items():
        lines.append(f"{lp}\t{w}\t{bo}")
    lines.append("")
    lines.append("\\2-grams:")
    for (v, w), (lp, bo) in bi.items():
        lines.append(f"{lp}\t{v} {w}\t{bo}")
    lines.append("")
    lines.append("\\3-grams:")
    for (u, v, w), lp in tri.items():
        lines.append(f"{lp}\t{u} {v} {w}")
    lines += ["", "\\end\\"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return uni, bi, tri


def test_arpalm_trigram_backoff_recursion(tmp_path):
    from kaldi_lstm_tpu.io.arpa import LN10, ArpaLM
    rng = np.random.RandomState(0)
    vocab = ["a", "b", "c"]
    uni, bi, tri = _write_trigram_arpa(tmp_path / "tri.arpa", rng, vocab)
    lm = ArpaLM.load(str(tmp_path / "tri.arpa"))
    assert lm.order == 3

    def ref_cond(hist, w):
        hist = tuple(hist)[-2:]
        if len(hist) == 2 and (hist[0], hist[1], w) in tri:
            return tri[(hist[0], hist[1], w)] * LN10
        if len(hist) == 2:
            bo = bi.get((hist[0], hist[1]), (0.0, 0.0))[1] * LN10
            return bo + ref_cond(hist[1:], w)
        if (hist[-1], w) in bi:
            return bi[(hist[-1], w)][0] * LN10
        return uni[hist[-1]][1] * LN10 + uni[w][0] * LN10

    for hist, w in [(("<s>",), "a"), (("<s>", "a"), "b"),
                    (("a", "b"), "c"), (("c", "a"), "</s>"),
                    (("b",), "a"), (("a", "c"), "b")]:
        np.testing.assert_allclose(lm.cond_logp(hist, w),
                                   ref_cond(hist, w), atol=1e-9)


def test_trigram_lmrescore_exact(tmp_path):
    """Rescore random ambiguous lattices with a TRIGRAM LM: per-path
    new cost = old - old_ARPA(path) + new_ARPA(path). Trigram history
    must survive epsilon arcs and state re-convergence."""
    from kaldi_lstm_tpu.io.arpa import ArpaLM, uniform_unigram
    from kaldi_lstm_tpu.io.lang import SymbolTable

    vocab = ["a", "b", "c", "d"]
    words = SymbolTable()
    words.add("<eps>", 0)
    for w in vocab:
        words.add(w)
    _write_trigram_arpa(tmp_path / "tri.arpa", np.random.RandomState(5),
                        vocab)
    lm_b = ArpaLM.load(str(tmp_path / "tri.arpa"))
    assert lm_b.order == 3
    lm_a = uniform_unigram(vocab)

    rng = np.random.RandomState(3)
    multi = 0
    for compact in (False, True):
        for _ in range(10):
            lat = _random_lattice(rng)
            clat = lattice_to_compact(lat) if compact else lat
            res = lattice_lmrescore(clat, lm_a, lm_b, words)
            old, new = {}, {}
            for p, c in _paths(clat, compact):
                old[p] = min(old.get(p, np.inf), round(c, 9))
            for p, c in _paths(res, compact):
                new[p] = min(new.get(p, np.inf), round(c, 9))
            assert set(new) == set(old)
            multi += len(old) > 1
            for p in old:
                seq = [words.id2sym[w] for w in p]
                want = old[p] + lm_a.score_sentence(seq) \
                    - lm_b.score_sentence(seq)
                np.testing.assert_allclose(new[p], want, atol=1e-8)
            # pure-add mode (old_lm=None): only the new LM joins
            res2 = lattice_lmrescore(clat, None, lm_b, words)
            new2 = {}
            for p, c in _paths(res2, compact):
                new2[p] = min(new2.get(p, np.inf), round(c, 9))
            assert set(new2) == set(old)
            for p in old:
                seq = [words.id2sym[w] for w in p]
                np.testing.assert_allclose(
                    new2[p], old[p] - lm_b.score_sentence(seq),
                    atol=1e-8)
    assert multi >= 10, "not enough multi-hypothesis lattices"


def test_lattice_to_post_exact_and_properties():
    """Posteriors pinned against brute-force path enumeration; per-frame
    gammas sum to 1; CompactLattice input auto-converts."""
    from kaldi_lstm_tpu.io.lattice import lattice_to_post

    def brute(lat, scale=1.0, lm=1.0):
        # enumerate (path arcs, prob); accumulate per-frame tid mass
        acc = []
        tot = 0.0

        def dfs(s, t, logp, arcs):
            nonlocal tot
            fin = lat.final.get(s)
            if fin is not None:
                p = np.exp(logp - (lm * fin[0] + scale * fin[1]))
                tot += p
                for (ft, tid) in arcs:
                    while len(acc) <= ft:
                        acc.append({})
                    acc[ft][tid] = acc[ft].get(tid, 0.0) + p
            for a in lat.arcs[s]:
                c = lm * a.graph_cost + scale * a.acoustic_cost
                dfs(a.dst, t + (1 if a.ilabel else 0), logp - c,
                    arcs + ([(t, a.ilabel)] if a.ilabel else []))

        dfs(lat.start, 0, 0.0, [])
        return [sorted((tid, g / tot) for tid, g in d.items())
                for d in acc]

    # time-synchronous random lattices: layered graph, one emitting arc
    # per layer step, optional epsilons inside a layer
    rng = np.random.RandomState(0)
    for _ in range(10):
        T, width = 4, 3
        lat = Lattice()
        layers = [[lat.add_state() for _ in range(width)]
                  for _ in range(T + 1)]
        lat.start = layers[0][0]
        for t in range(T):
            for i, s in enumerate(layers[t]):
                for _ in range(rng.randint(1, 3)):
                    lat.arcs[s].append(LatticeArc(
                        int(rng.randint(1, 5)), int(rng.randint(0, 3)),
                        round(float(rng.rand()), 3),
                        round(float(rng.rand()), 3),
                        layers[t + 1][rng.randint(0, width)]))
                if i + 1 < width and rng.rand() < 0.4:  # eps in-layer
                    lat.arcs[s].append(LatticeArc(
                        0, 0, round(float(rng.rand()), 3), 0.0,
                        layers[t][i + 1]))
        for s in layers[T]:
            lat.final[s] = (round(float(rng.rand()), 3), 0.0)
        got = lattice_to_post(lat, 0.7, 1.0)
        want = brute(lat, 0.7, 1.0)
        assert len(got) == len(want) == T
        for gt, wt in zip(got, want):
            assert [tid for tid, _ in gt] == [tid for tid, _ in wt]
            np.testing.assert_allclose([g for _, g in gt],
                                       [g for _, g in wt], atol=1e-9)
            np.testing.assert_allclose(sum(g for _, g in gt), 1.0,
                                       atol=1e-9)
        # CompactLattice round-trip gives the same posteriors
        got_c = lattice_to_post(lattice_to_compact(lat), 0.7, 1.0)
        for gt, wt in zip(got_c, want):
            np.testing.assert_allclose([g for _, g in gt],
                                       [g for _, g in wt], atol=1e-9)


def test_lattice_to_post_rejects_async():
    from kaldi_lstm_tpu.io.lattice import lattice_to_post
    lat = Lattice()
    for _ in range(3):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(1, 0, 0.1, 0.1, 2))   # 1 frame
    lat.arcs[0].append(LatticeArc(0, 0, 0.1, 0.1, 1))   # eps
    lat.arcs[1].append(LatticeArc(2, 0, 0.1, 0.1, 2))   # also 1 frame
    lat.arcs[1].append(LatticeArc(3, 0, 0.1, 0.1, 2))
    lat.final[2] = (0.0, 0.0)
    # state 2 reachable at frame 1 via both routes: OK
    assert lattice_to_post(lat)
    # now add a 2-frame route into state 2
    mid = lat.add_state()
    lat.arcs[0].append(LatticeArc(4, 0, 0.1, 0.1, mid))
    lat.arcs[mid].append(LatticeArc(5, 0, 0.1, 0.1, 2))
    with pytest.raises(ValueError, match="time-synchronous"):
        lattice_to_post(lat)


def test_lattice_to_post_cli(tmp_path):
    from kaldi_lstm_tpu.io.lattice import LatticeWriter
    from kaldi_lstm_tpu.io.kaldi_io import RandomAccessPosteriorReader
    from kaldi_lstm_tpu.tools.lattice_to_post import main
    lat = Lattice()
    for _ in range(3):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(1, 5, 0.0, 1.0, 1))
    lat.arcs[0].append(LatticeArc(2, 6, 0.0, 2.0, 1))
    lat.arcs[1].append(LatticeArc(3, 0, 0.0, 0.5, 2))
    lat.final[2] = (0.0, 0.0)
    with LatticeWriter(f"ark:{tmp_path}/lat.ark") as w:
        w.write("u1", lat)
    assert main([f"ark:{tmp_path}/lat.ark",
                 f"ark:{tmp_path}/post.ark"]) == 0
    r = RandomAccessPosteriorReader(f"ark:{tmp_path}/post.ark")
    post = r.value("u1")
    assert len(post) == 2
    f0 = dict(post[0])
    np.testing.assert_allclose(f0[1], np.exp(-1) / (np.exp(-1)
                                                    + np.exp(-2)),
                               rtol=1e-5)


def test_text_ark_roundtrip_trivial_first_record():
    """Framing regression: a record whose first body line is a bare
    final state ('0') must not swallow the separator of the next
    record (reader previously consumed 2 bytes blindly)."""
    import io as _io
    from kaldi_lstm_tpu.io.lattice import (
        CompactLattice,
        LatticeWriter,
        SequentialLatticeReader,
    )
    import tempfile, os
    trivial = CompactLattice()
    trivial.add_state()
    trivial.final[0] = (0.0, 0.0, ())
    lat2 = Lattice()
    for _ in range(2):
        lat2.add_state()
    lat2.arcs[0].append(LatticeArc(1, 2, 0.5, 0.5, 1))
    lat2.final[1] = (0.0, 0.0)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.ark")
        with LatticeWriter(f"ark,t:{p}") as w:
            w.write("utt1", trivial)
            w.write("utt2", lat2)
        got = list(SequentialLatticeReader(f"ark:{p}"))
    assert [k for k, _ in got] == ["utt1", "utt2"]
    assert got[0][1].num_states == 1 and 0 in got[0][1].final
    assert got[1][1].num_arcs() == 1


def test_lattice_to_post_raises_on_no_final():
    from kaldi_lstm_tpu.io.lattice import lattice_to_post
    lat = Lattice()
    for _ in range(2):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(7, 0, 0.1, 0.1, 1))
    with pytest.raises(ValueError, match="no complete path"):
        lattice_to_post(lat)
