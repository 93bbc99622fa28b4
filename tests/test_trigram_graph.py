"""Any-order decoding graphs (VERDICT r2 item 8): the n-gram
history-state expansion in decode/graph.py must (a) reproduce the
dedicated bigram builder exactly at order 2 and (b) make direct trigram
decoding equal to the classic decode-bigram + rescore-trigram flow."""

import numpy as np
import pytest

from kaldi_lstm_tpu.decode.determinize import determinize_lattice
from kaldi_lstm_tpu.decode.faster import decode_faster
from kaldi_lstm_tpu.decode.graph import (
    build_decoding_graph,
    build_decoding_graph_ngram,
    build_graph_from_arpa,
)
from kaldi_lstm_tpu.decode.lattice_faster import decode_lattice_faster
from kaldi_lstm_tpu.io.arpa import ArpaBigram, ArpaLM, bigram_as_arpalm
from kaldi_lstm_tpu.io.lattice import lattice_best_path, lattice_lmrescore
from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
from tests.test_lattice_ops import _write_trigram_arpa
from tests.test_word_decode import _emit, _oracle_setup


def test_ngram_builder_matches_bigram_builder_order2():
    """Same decodes (words AND total score) through both builders for an
    order-2 LM."""
    lex, lm, tm, means, rng = _oracle_setup(num_words=5, seed=23)
    g_bi = build_decoding_graph(tm, lex, lm)
    g_ng = build_decoding_graph_ngram(tm, lex, bigram_as_arpalm(lm),
                                      words=g_bi.words)
    for _ in range(5):
        sent = sample_sentence(rng, lm, sorted(lex), 5) or ["w000"]
        ll = _emit(tm, lex, means, rng, sent, noise=0.8)
        r_bi = decode_faster(g_bi, ll, acoustic_scale=1.0, beam=18.0)
        r_ng = decode_faster(g_ng, ll, acoustic_scale=1.0, beam=18.0)
        assert r_bi.words == r_ng.words
        np.testing.assert_allclose(r_bi.score, r_ng.score, atol=1e-9)


def test_ngram_builder_order2_with_silence():
    lex, lm, tm, means, rng = _oracle_setup(num_words=4, seed=29)
    sil = max(p for prons in lex.values() for pr in prons for p in pr) + 1
    # silence phone must exist in the topology/transition model
    from kaldi_lstm_tpu.io.transition_model import \
        make_monophone_transition_model
    nphones = sil
    tm2 = make_monophone_transition_model(nphones + 1)
    g_bi = build_decoding_graph(tm2, lex, lm, sil_phone=sil,
                                sil_prob=0.2)
    g_ng = build_decoding_graph_ngram(tm2, lex, bigram_as_arpalm(lm),
                                      words=g_bi.words, sil_phone=sil,
                                      sil_prob=0.2)
    for _ in range(3):
        sent = sample_sentence(rng, lm, sorted(lex), 4) or ["w000"]
        ll = _emit(tm2, lex, means, rng, sent, noise=0.8)
        r_bi = decode_faster(g_bi, ll, acoustic_scale=1.0, beam=18.0)
        r_ng = decode_faster(g_ng, ll, acoustic_scale=1.0, beam=18.0)
        assert r_bi.words == r_ng.words
        np.testing.assert_allclose(r_bi.score, r_ng.score, atol=1e-9)


def _sane_trigram_lm(rng, vocab):
    """A trigram ArpaLM where every explicit n-gram is MORE probable than
    its backoff route — the property real smoothed LMs have, and the
    regime where the backoff-WFSA (min-cost over explicit + backoff
    arcs, exactly upstream G.fst's construction) scores word sequences
    EXACTLY like recursive ARPA evaluation. (A random unnormalized LM
    can make a backoff route beat an explicit trigram, where any
    backoff-arc graph — upstream included — scores the cheaper route.)"""
    import itertools as it
    lm = ArpaLM(order=3)
    full = list(vocab) + ["</s>"]
    lm.ngrams[1] = {("<s>",): (-20.0, rng.uniform(-1.2, -0.3))}
    for w in full:
        lm.ngrams[1][(w,)] = (rng.uniform(-3.0, -1.0),
                              rng.uniform(-1.2, -0.3))
    # explicit entries must dominate not only their own backoff route
    # but the corresponding LOWER-ORDER probability too (p3 >= p2 + d,
    # p2 >= p1 + d, eos continuations always explicit): otherwise a
    # min-cost path can deliberately back off into a WEAKER history
    # state to enjoy cheaper future arcs, and any backoff-arc WFSA
    # (upstream G.fst included) scores below the exact ARPA value.
    lm.ngrams[2] = {}
    for v, w in it.product(["<s>"] + list(vocab), full):
        if w == "</s>" or rng.rand() < 0.6:
            base = lm.ngrams[1][(w,)][0]
            lm.ngrams[2][(v, w)] = (base + rng.uniform(0.05, 0.5),
                                    rng.uniform(-1.0, -0.2))
    lm.ngrams[3] = {}
    for (u, v) in list(lm.ngrams[2]):
        if v == "</s>":
            continue
        for w in full:
            if w == "</s>" or rng.rand() < 0.5:
                base = lm.cond_logp((v,), w)
                lm.ngrams[3][(u, v, w)] = (base + rng.uniform(0.05, 0.4),
                                           0.0)
    return lm


def test_trigram_decode_matches_bigram_decode_plus_rescore():
    """The VERDICT-pinned equality: direct decoding through the trigram
    graph == latgen through the trigram's step-down bigram + exact
    trigram lattice rescore, on words and total cost (wide beams,
    oracle-ish acoustics)."""
    lex, _, tm, means, rng = _oracle_setup(num_words=5, seed=31)
    vocab = sorted(lex)
    lm_tri = _sane_trigram_lm(np.random.RandomState(11), vocab)
    assert lm_tri.order == 3 and len(lm_tri.ngrams[3]) > 20

    # step-down bigram proxy: the trigram's own 1/2-gram tables (what a
    # classic decode-then-rescore flow would compile into HCLG)
    lm_bi = ArpaBigram()
    lm_bi.unigram = {w: v for (w,), v in lm_tri.ngrams[1].items()}
    lm_bi.bigram = {k: lp for k, (lp, _bo) in lm_tri.ngrams[2].items()}

    g_tri = build_decoding_graph_ngram(tm, lex, lm_tri)
    g_bi = build_decoding_graph(tm, lex, lm_bi, words=g_tri.words)

    n_diff_from_bigram = 0
    for _ in range(6):
        # random word sequence (the step-down bigram table is sparse, so
        # sample_sentence's dense-bigram assumption doesn't hold here)
        sent = [vocab[rng.randint(len(vocab))]
                for _ in range(1 + rng.randint(5))]
        ll = _emit(tm, lex, means, rng, sent, noise=0.9)
        direct = decode_faster(g_tri, ll, acoustic_scale=1.0, beam=24.0)
        raw = decode_lattice_faster(g_bi, ll, acoustic_scale=1.0,
                                    beam=24.0, lattice_beam=16.0)
        det = determinize_lattice(raw)
        res = lattice_lmrescore(det, lm_bi, lm_tri, g_tri.words)
        w_resc, _, c_resc = lattice_best_path(res)
        assert w_resc == direct.words
        np.testing.assert_allclose(c_resc, -direct.score, atol=1e-6)
        bi_best = decode_faster(g_bi, ll, acoustic_scale=1.0, beam=24.0)
        n_diff_from_bigram += (bi_best.words != direct.words
                               or abs(bi_best.score - direct.score)
                               > 1e-6)
    # the trigram must actually CHANGE something vs the bigram decode,
    # otherwise this test has no teeth
    assert n_diff_from_bigram >= 2


def test_build_graph_from_arpa_dispatch(tmp_path):
    """order<=2 files go through the bigram builder, order-3 through the
    n-gram expansion; both decode."""
    lex, lm, tm, means, rng = _oracle_setup(num_words=4, seed=37)
    lm.save(str(tmp_path / "bi.arpa"))
    _write_trigram_arpa(tmp_path / "tri.arpa", np.random.RandomState(2),
                        sorted(lex))
    g2 = build_graph_from_arpa(tm, lex, str(tmp_path / "bi.arpa"))
    g3 = build_graph_from_arpa(tm, lex, str(tmp_path / "tri.arpa"))
    g_ref = build_decoding_graph(tm, lex, lm)
    sent = sample_sentence(rng, lm, sorted(lex), 4) or ["w000"]
    ll = _emit(tm, lex, means, rng, sent, noise=0.8)
    r2 = decode_faster(g2, ll, acoustic_scale=1.0, beam=18.0)
    rr = decode_faster(g_ref, ll, acoustic_scale=1.0, beam=18.0)
    assert r2.words == rr.words
    np.testing.assert_allclose(r2.score, rr.score, atol=1e-9)
    r3 = decode_faster(g3, ll, acoustic_scale=1.0, beam=18.0)
    assert r3.words  # decodes through the trigram graph
