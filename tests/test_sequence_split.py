"""Sequence training on chain-style `<Tuples>` split-pdf models
(VERDICT r2 item 9): SplitDenGraph's per-arc-emission forward, numerator
and E[A], pinned against brute-force path enumeration, plus the
den_graph_for dispatch that closes the PARITY gap."""

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.decode.viterbi import PhoneLoopGraph
from kaldi_lstm_tpu.io.transition_model import (
    make_chain_transition_model,
    make_monophone_transition_model,
)
from kaldi_lstm_tpu.train.sequence import (
    DenGraph,
    PhoneLoopDenGraph,
    SplitDenGraph,
    den_graph_for,
    den_logprob,
    expected_accuracy,
    mmi_objective,
    num_logprob,
)

P = 3


def _split_setup():
    tm = make_chain_transition_model(P)
    g = PhoneLoopGraph.from_transition_model(tm)
    assert not np.array_equal(g.self_pdf, g.state_pdf), \
        "chain model must have split pdfs"
    return tm, g, SplitDenGraph.from_phone_loop(g)


def _brute_force(g, loglik, L, want_acc=None):
    """Enumerate every path of L frames through the split-arc graph.
    Returns logZ (and E[A] when want_acc [T] ref pdfs given)."""
    ns = g.state_pdf.shape[0]
    logA = np.asarray(g.logA_enter)
    self_logp = np.asarray(g.self_logp)
    start = np.asarray(g.start_logp)
    final = np.asarray(g.final_logp)
    s_pdf = np.asarray(g.state_pdf)
    l_pdf = np.asarray(g.self_pdf)
    ll = np.asarray(loglik)

    scores, accs = [], []

    def rec(t, s, sc, acc):
        if t == L - 1:
            # last frame consumed by the exit arc (fwd pdf)
            tot = sc + ll[t, s_pdf[s]] + final[s]
            if tot > -1e20:
                scores.append(tot)
                accs.append(acc + (want_acc is not None
                                   and s_pdf[s] == want_acc[t]))
            return
        # self-loop
        if self_logp[s] > -1e20:
            rec(t + 1, s,
                sc + self_logp[s] + ll[t, l_pdf[s]],
                acc + (want_acc is not None and l_pdf[s] == want_acc[t]))
        # enter arcs
        for j in range(ns):
            if logA[s, j] > -1e20:
                rec(t + 1, j, sc + logA[s, j] + ll[t, s_pdf[s]],
                    acc + (want_acc is not None
                           and s_pdf[s] == want_acc[t]))

    for s0 in range(ns):
        if start[s0] > -1e20:
            rec(0, s0, start[s0], 0)
    scores = np.asarray(scores)
    m = scores.max()
    w = np.exp(scores - m)
    logZ = m + np.log(w.sum())
    if want_acc is None:
        return logZ
    ea = float((w * np.asarray(accs, np.float64)).sum() / w.sum())
    return logZ, ea


def test_split_den_matches_enumeration():
    _, g, graph = _split_setup()
    rng = np.random.RandomState(0)
    K = int(np.asarray(g.state_pdf).max()
            | np.asarray(g.self_pdf).max()) + 1
    T = 5
    ll = rng.randn(T, K).astype(np.float32)
    # batch of 2 with different lengths (trailing padding)
    B_ll = np.zeros((2, T, K), np.float32)
    B_ll[0] = ll
    B_ll[1] = rng.randn(T, K)
    mask = np.ones((2, T), np.float32)
    mask[1, 4:] = 0.0
    got = den_logprob(graph, jnp.asarray(B_ll), jnp.asarray(mask),
                      acoustic_scale=0.8)
    want0 = _brute_force(g, 0.8 * B_ll[0], T)
    want1 = _brute_force(g, 0.8 * B_ll[1], 4)
    np.testing.assert_allclose(np.asarray(got), [want0, want1],
                               rtol=1e-5)


def test_split_expected_accuracy_matches_enumeration():
    _, g, graph = _split_setup()
    rng = np.random.RandomState(1)
    K = int(max(np.asarray(g.state_pdf).max(),
                np.asarray(g.self_pdf).max())) + 1
    T = 5
    ll = rng.randn(1, T, K).astype(np.float32)
    ref = rng.randint(0, K, (1, T)).astype(np.int32)
    mask = np.ones((1, T), np.float32)
    ea = expected_accuracy(graph, jnp.asarray(ll), jnp.asarray(ref),
                           jnp.asarray(mask), acoustic_scale=0.7)
    _, want = _brute_force(g, 0.7 * ll[0], T, want_acc=ref[0])
    np.testing.assert_allclose(float(ea[0]), want, rtol=1e-4)


def test_split_num_and_mmi_finite_grad():
    tm, g, graph = _split_setup()
    rng = np.random.RandomState(2)
    K = int(max(np.asarray(g.state_pdf).max(),
                np.asarray(g.self_pdf).max())) + 1
    T = 8
    # a valid path: phone with 2 chain states? chain model is 1 state
    # per phone with self-loops — stay runs then jumps
    ns = g.state_pdf.shape[0]
    path = []
    s = 0
    for t in range(T):
        path.append(s)
        if rng.rand() < 0.4:
            s = rng.randint(ns)
    states = np.asarray([path], np.int32)
    ll = jnp.asarray(rng.randn(1, T, K).astype(np.float32))
    mask = jnp.ones((1, T), jnp.float32)
    num = num_logprob(graph, ll, jnp.asarray(states), mask)
    assert np.isfinite(float(num[0]))
    obj, per = mmi_objective(graph, ll, jnp.asarray(states), mask)
    assert np.isfinite(float(obj))
    assert float(per[0]) >= -1e-4  # den >= num up to path-prior slack
    grad = jax.grad(lambda x: mmi_objective(graph, x,
                                            jnp.asarray(states),
                                            mask)[0])(ll)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).max()) > 0


def test_den_graph_for_dispatch():
    assert isinstance(den_graph_for(make_chain_transition_model(P)),
                      SplitDenGraph)
    assert isinstance(den_graph_for(make_monophone_transition_model(P, 3)),
                      PhoneLoopDenGraph)


def test_split_reduces_to_dense_on_triples():
    """On a triples-era model (self == fwd pdfs, multi-state phones so
    the dense graph has no Viterbi-merged parallel arcs), the split
    formulation must agree with DenGraph exactly."""
    tm = make_monophone_transition_model(4, 3)
    g = PhoneLoopGraph.from_transition_model(tm)
    dense = DenGraph.from_phone_loop(g)
    split = SplitDenGraph.from_phone_loop(g)
    rng = np.random.RandomState(3)
    K = 12
    ll = jnp.asarray(rng.randn(2, 9, K).astype(np.float32))
    mask = np.ones((2, 9), np.float32)
    mask[1, 6:] = 0.0
    a = den_logprob(dense, ll, jnp.asarray(mask), acoustic_scale=0.9)
    b = den_logprob(split, ll, jnp.asarray(mask), acoustic_scale=0.9)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
