"""Structured O(Ns) phone-loop denominator graph vs the dense DenGraph:
identical logZ / numerator / MMI / E[A] on multi-state topologies (where
the dense graph has no Viterbi-merged parallel arcs), and the defining
inequality on 1-state phones."""

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.decode.viterbi import PhoneLoopGraph
from kaldi_lstm_tpu.io.transition_model import (
    make_monophone_transition_model,
)
from kaldi_lstm_tpu.train.sequence import (
    DenGraph,
    PhoneLoopDenGraph,
    den_logprob,
    expected_accuracy,
    mmi_objective,
    num_logprob,
)

P, SPS = 4, 3


def _graphs():
    tm = make_monophone_transition_model(P, SPS)
    dense = DenGraph.from_phone_loop(
        PhoneLoopGraph.from_transition_model(tm))
    struct = PhoneLoopDenGraph.from_transition_model(tm)
    return tm, dense, struct


def _batch(rng, B=3, T=14, K=P * SPS):
    loglik = jnp.asarray(rng.randn(B, T, K).astype(np.float32))
    mask = np.ones((B, T), np.float32)
    mask[1, 10:] = 0.0
    mask[2, 7:] = 0.0
    return loglik, jnp.asarray(mask)


def _paths(rng, B=3, T=14):
    """Valid graph-state paths: per phone, >=1 frame in each of its SPS
    states in order."""
    out = np.zeros((B, T), np.int32)
    for b in range(B):
        path = []
        while len(path) < T:
            base = (rng.randint(P)) * SPS
            for s in range(SPS):
                d = 1 + rng.randint(2)
                path += [base + s] * d
        out[b] = path[:T]
    return jnp.asarray(out)


def test_den_logZ_matches_dense():
    rng = np.random.RandomState(0)
    _tm, dense, struct = _graphs()
    loglik, mask = _batch(rng)
    a = den_logprob(dense, loglik, mask, acoustic_scale=0.7)
    b = den_logprob(struct, loglik, mask, acoustic_scale=0.7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_num_logprob_matches_dense():
    rng = np.random.RandomState(1)
    _tm, dense, struct = _graphs()
    loglik, mask = _batch(rng)
    states = _paths(rng)
    a = num_logprob(dense, loglik, states, mask, acoustic_scale=0.7)
    b = num_logprob(struct, loglik, states, mask, acoustic_scale=0.7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_mmi_and_gradient_match_dense():
    rng = np.random.RandomState(2)
    _tm, dense, struct = _graphs()
    loglik, mask = _batch(rng)
    states = _paths(rng)

    def obj(g):
        def f(ll):
            return mmi_objective(g, ll, states, mask, 0.7)[0]
        return f

    va, ga = jax.value_and_grad(obj(dense))(loglik)
    vb, gb = jax.value_and_grad(obj(struct))(loglik)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=2e-4, atol=2e-5)


def test_expected_accuracy_matches_dense():
    rng = np.random.RandomState(3)
    _tm, dense, struct = _graphs()
    loglik, mask = _batch(rng)
    ref = jnp.asarray(rng.randint(0, P * SPS, (3, 14)), jnp.int32)
    a = expected_accuracy(dense, loglik, ref, mask, 0.7)
    b = expected_accuracy(struct, loglik, ref, mask, 0.7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    ga = jax.grad(lambda ll: -jnp.sum(
        expected_accuracy(dense, ll, ref, mask, 0.7)))(loglik)
    gb = jax.grad(lambda ll: -jnp.sum(
        expected_accuracy(struct, ll, ref, mask, 0.7)))(loglik)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=2e-4, atol=2e-5)


def test_one_state_phone_keeps_reentry_mass():
    """Dense DenGraph Viterbi-merges a 1-state phone's self-loop with
    its re-entry loop-back (max); the structured graph keeps both lse
    terms, so its logZ is >= the dense one."""
    tm = make_monophone_transition_model(3, 1)
    dense = DenGraph.from_phone_loop(
        PhoneLoopGraph.from_transition_model(tm))
    struct = PhoneLoopDenGraph.from_transition_model(tm)
    rng = np.random.RandomState(4)
    loglik = jnp.asarray(rng.randn(2, 9, 3).astype(np.float32))
    mask = jnp.ones((2, 9), jnp.float32)
    a = np.asarray(den_logprob(dense, loglik, mask))
    b = np.asarray(den_logprob(struct, loglik, mask))
    assert (b >= a - 1e-5).all()
    assert (b > a + 1e-3).any()  # the extra parallel-arc mass is real


def test_skip_arc_topology_rejected():
    import pytest
    tm = make_monophone_transition_model(2, 3)
    # add a skip arc 0 -> 2 to phase 0 of the shared topology entry
    tm.topo.entries[0][0].transitions.append((2, 0.1))
    with pytest.raises(ValueError, match="no-skip"):
        PhoneLoopDenGraph.from_transition_model(tm)
