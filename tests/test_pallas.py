"""Pallas fused LSTM scan vs the lax.scan reference implementation:
forward, state carry, and full VJP parity (interpreter mode on CPU; the
same kernels compile for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.ops import LstmState, init_lstm_params, lstm_scan
from kaldi_lstm_tpu.ops.lstm_pallas import lstm_scan_pallas

CASES = [
    # S, T, I, C, R  (exercise padding: C,R not tile multiples; odd S)
    (3, 5, 7, 9, 6),
    (8, 4, 16, 128, 128),
    (2, 6, 5, 200, 130),
]


def make(S, T, I, C, R, seed=0):
    key = jax.random.PRNGKey(seed)
    kp, kx, kc, kr = jax.random.split(key, 4)
    params = init_lstm_params(kp, I, C, R, param_scale=0.3)
    x = jax.random.normal(kx, (S, T, I))
    state = LstmState(c=jax.random.normal(kc, (S, C)) * 0.2,
                      r=jax.random.normal(kr, (S, R)) * 0.2)
    return params, x, state


@pytest.mark.parametrize("S,T,I,C,R", CASES)
def test_forward_parity(S, T, I, C, R):
    params, x, state = make(S, T, I, C, R)
    ref_out, ref_fin = lstm_scan(params, x, state)
    out, fin = lstm_scan_pallas(params, x, state, interpret=True)
    np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fin.c, ref_fin.c, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fin.r, ref_fin.r, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,T,I,C,R", CASES[:2])
def test_vjp_parity(S, T, I, C, R):
    params, x, state = make(S, T, I, C, R, seed=1)

    def loss_ref(p, xx, st):
        out, fin = lstm_scan(p, xx, st)
        return (jnp.sum(out * jnp.cos(jnp.arange(out.size, dtype=out.dtype)
                                      .reshape(out.shape)))
                + jnp.sum(fin.c * 0.5) + jnp.sum(fin.r * -0.25))

    def loss_pl(p, xx, st):
        out, fin = lstm_scan_pallas(p, xx, st, interpret=True)
        return (jnp.sum(out * jnp.cos(jnp.arange(out.size, dtype=out.dtype)
                                      .reshape(out.shape)))
                + jnp.sum(fin.c * 0.5) + jnp.sum(fin.r * -0.25))

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x, state)
    pl_grads = jax.grad(loss_pl, argnums=(0, 1, 2))(params, x, state)
    for rg, pg in zip(jax.tree_util.tree_leaves(ref_grads),
                      jax.tree_util.tree_leaves(pl_grads)):
        np.testing.assert_allclose(np.asarray(pg), np.asarray(rg),
                                   rtol=2e-4, atol=2e-4)


def test_cell_clip_active_parity():
    params, x, state = make(2, 4, 5, 9, 6, seed=2)
    x = x * 50.0  # force clipping
    ref_out, _ = lstm_scan(params, x, state, cell_clip=1.0)
    out, _ = lstm_scan_pallas(params, x, state, cell_clip=1.0,
                              interpret=True)
    np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(lambda p: jnp.sum(
        lstm_scan(p, x, state, cell_clip=1.0)[0]))(params)
    g_pl = jax.grad(lambda p: jnp.sum(
        lstm_scan_pallas(p, x, state, cell_clip=1.0,
                         interpret=True)[0]))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_time_major_parity():
    """time_major=True must equal the stream-major path (values and full
    VJP) with inputs/outputs transposed."""
    S, T, I, C, R = 3, 6, 7, 9, 6
    params, x, state = make(S, T, I, C, R, seed=4)
    x_tm = x.swapaxes(0, 1)

    ref_out, ref_fin = lstm_scan(params, x, state)
    out_tm, fin_tm = lstm_scan_pallas(params, x_tm, state, interpret=True,
                                      time_major=True)
    np.testing.assert_allclose(out_tm.swapaxes(0, 1), ref_out,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fin_tm.c, ref_fin.c, rtol=1e-5, atol=1e-5)

    # scan path too
    out_scan_tm, fin_scan_tm = lstm_scan(params, x_tm, state,
                                         time_major=True)
    np.testing.assert_allclose(out_scan_tm.swapaxes(0, 1), ref_out,
                               rtol=1e-5, atol=1e-5)

    def loss_ref(p, xx, st):
        out, fin = lstm_scan(p, xx, st)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     .reshape(out.shape))) + jnp.sum(fin.c)

    def loss_tm(p, xx_tm, st):
        out, fin = lstm_scan_pallas(p, xx_tm, st, interpret=True,
                                    time_major=True)
        out = out.swapaxes(0, 1)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     .reshape(out.shape))) + jnp.sum(fin.c)

    ref_g = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x, state)
    tm_g = jax.grad(loss_tm, argnums=(0, 1, 2))(params, x_tm, state)
    np.testing.assert_allclose(np.asarray(tm_g[1]),
                               np.asarray(ref_g[1]).swapaxes(0, 1),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves((tm_g[0], tm_g[2])),
                    jax.tree_util.tree_leaves((ref_g[0], ref_g[2]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_chunk_chaining_parity():
    params, x, state = make(4, 8, 6, 12, 10, seed=3)
    out_a, st_a = lstm_scan_pallas(params, x[:, :5], state, interpret=True)
    out_b, st_b = lstm_scan_pallas(params, x[:, 5:], st_a, interpret=True)
    ref_full, ref_fin = lstm_scan(params, x, state)
    np.testing.assert_allclose(
        np.concatenate([out_a, out_b], 1), ref_full, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(st_b.c, ref_fin.c, rtol=1e-5, atol=1e-5)


def test_no_input_grad_param_grads_identical():
    """need_input_grad=False skips the dx GEMM but every parameter and
    state gradient is bit-identical; the x cotangent comes back zero."""
    params, x, state = make(6, 10, 9, 17, 11, seed=5)

    def loss(p, xx, st, need):
        out, fin = lstm_scan_pallas(p, xx, st, interpret=True,
                                    need_input_grad=need)
        return jnp.sum(out * 0.3) + jnp.sum(fin.c) + jnp.sum(fin.r)

    g_full = jax.grad(loss, argnums=(0, 1, 2))(params, x, state, True)
    g_skip = jax.grad(loss, argnums=(0, 1, 2))(params, x, state, False)
    for a, b in zip(jax.tree_util.tree_leaves((g_full[0], g_full[2])),
                    jax.tree_util.tree_leaves((g_skip[0], g_skip[2]))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(g_skip[1]),
                                  np.zeros_like(np.asarray(x)))
    assert np.any(np.asarray(g_full[1]) != 0)
