"""Correctness of the projected-LSTM cell.

Strategy (SURVEY.md §4): (a) forward cross-check against an independent
per-timestep numpy implementation of the reference equations
(bd-nnet-lstm-projected-streams.h:261-325); (b) finite-difference gradient
checks of jax.grad (the reference's "Version 1: precise gradients"
backward, bd-nnet-lstm-projected-streams.h:388-391).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.ops import (
    LstmState,
    init_lstm_params,
    lstm_scan,
    zero_state,
)

S, T, I, C, R = 3, 7, 5, 11, 4


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def numpy_reference_lstm(params, x, c0, r0, cell_clip=50.0):
    """Independent per-t numpy implementation of the reference equations."""
    w_x = np.asarray(params.w_gifo_x)
    w_r = np.asarray(params.w_gifo_r)
    bias = np.asarray(params.bias)
    p_i = np.asarray(params.peephole_i_c)
    p_f = np.asarray(params.peephole_f_c)
    p_o = np.asarray(params.peephole_o_c)
    w_rm = np.asarray(params.w_r_m)
    ncell = bias.shape[0] // 4

    S_, T_, _ = x.shape
    c, r = np.array(c0), np.array(r0)
    out = np.zeros((S_, T_, w_rm.shape[0]), np.float64)
    for t in range(T_):
        gifo = x[:, t] @ w_x.T + bias + r @ w_r.T
        g = np.tanh(gifo[:, 0 * ncell:1 * ncell])
        i = np_sigmoid(gifo[:, 1 * ncell:2 * ncell] + c * p_i)
        f = np_sigmoid(gifo[:, 2 * ncell:3 * ncell] + c * p_f)
        o_pre = gifo[:, 3 * ncell:4 * ncell]
        c = g * i + c * f
        c = np.clip(c, -cell_clip, cell_clip)
        h = np.tanh(c)
        o = np_sigmoid(o_pre + c * p_o)
        m = h * o
        r = m @ w_rm.T
        out[:, t] = r
    return out, c, r


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    kp, kx, kc, kr = jax.random.split(key, 4)
    params = init_lstm_params(kp, I, C, R, param_scale=0.5)
    x = jax.random.normal(kx, (S, T, I))
    c0 = jax.random.normal(kc, (S, C)) * 0.1
    r0 = jax.random.normal(kr, (S, R)) * 0.1
    return params, x, LstmState(c=c0, r=r0)


def test_forward_matches_numpy_reference(setup):
    params, x, state = setup
    out, final = lstm_scan(params, x, state)
    ref_out, ref_c, ref_r = numpy_reference_lstm(
        params, np.asarray(x, np.float64), state.c, state.r)
    np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(final.c, ref_c, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(final.r, ref_r, rtol=1e-5, atol=1e-5)


def test_zero_state_shapes():
    st = zero_state(S, C, R)
    assert st.c.shape == (S, C) and st.r.shape == (S, R)


def test_state_carry_chains_chunks(setup):
    """Running [0:T] in one call == two chained calls over [0:k], [k:T]
    (the reference's cross-batch state bridge,
    bd-nnet-lstm-projected-streams.h:229-231,330-331)."""
    params, x, state = setup
    out_full, final_full = lstm_scan(params, x, state)
    k = 3
    out_a, st_a = lstm_scan(params, x[:, :k], state)
    out_b, st_b = lstm_scan(params, x[:, k:], st_a)
    np.testing.assert_allclose(
        out_full, np.concatenate([out_a, out_b], axis=1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(final_full.c, st_b.c, rtol=1e-5, atol=1e-6)


def test_grad_matches_finite_differences(setup):
    params, x, state = setup

    def loss(params, x, state):
        out, _ = lstm_scan(params, x, state)
        # weighted sum to exercise all outputs with distinct cotangents
        w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape)
        return jnp.sum(out * jnp.sin(w))

    grads = jax.grad(loss, argnums=(0, 1, 2))(params, x, state)
    flat_g, _ = jax.tree_util.tree_flatten(grads)
    flat_args, unflatten = jax.tree_util.tree_flatten((params, x, state))

    rng = np.random.RandomState(0)
    eps = 1e-3
    for leaf_idx in range(len(flat_args)):
        arr = np.asarray(flat_args[leaf_idx], np.float64)
        # probe a few random coordinates per tensor
        for _ in range(3):
            idx = tuple(rng.randint(0, d) for d in arr.shape)
            def f(v):
                pert = [np.asarray(a, np.float64) for a in flat_args]
                pert[leaf_idx] = pert[leaf_idx].copy()
                pert[leaf_idx][idx] = v
                p, xx, st = jax.tree_util.tree_unflatten(
                    unflatten, [jnp.asarray(a, jnp.float32) for a in pert])
                return float(loss(p, xx, st))
            v0 = arr[idx]
            fd = (f(v0 + eps) - f(v0 - eps)) / (2 * eps)
            ad = float(np.asarray(flat_g[leaf_idx])[idx])
            assert abs(fd - ad) < 2e-2 * max(1.0, abs(fd)), (
                f"leaf {leaf_idx} idx {idx}: fd={fd} ad={ad}")


def test_cell_clip_straight_through():
    """At the clip boundary the forward saturates but gradients still flow
    (the reference backward ignores the clip)."""
    key = jax.random.PRNGKey(1)
    params = init_lstm_params(key, I, C, R, param_scale=0.5)
    x = jnp.ones((1, 4, I)) * 100.0  # drive cells into saturation
    st = zero_state(1, C, R)

    out_clip, fin = lstm_scan(params, x, st, cell_clip=0.01)
    assert float(jnp.max(jnp.abs(fin.c))) <= 0.01 + 1e-6

    g = jax.grad(lambda p: jnp.sum(lstm_scan(p, x, st, cell_clip=0.01)[0]))(
        params)
    # straight-through: input weights still receive gradient
    assert float(jnp.max(jnp.abs(g.w_gifo_x))) > 0.0
