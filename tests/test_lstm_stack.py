"""Wavefront-fused 2-layer LSTMP kernel (ops/lstm_stack_pallas.py)
vs the serial composition of two lstm_cell scans — interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.ops import lstm_stack_pallas as w2
from kaldi_lstm_tpu.ops.lstm_cell import (
    init_lstm_params,
    lstm_scan,
    zero_state,
)
from kaldi_lstm_tpu.ops.lstm_pallas import _plan_dims

S, T, I, C, R = 6, 20, 12, 24, 16
CLIP = 3.0  # small so the clip actually engages with ParamScale 0.3


def _setup(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    p1 = init_lstm_params(k1, I, C, R, 0.3)
    p2 = init_lstm_params(k2, R, C, R, 0.3)
    x = jax.random.normal(jax.random.PRNGKey(3), (S, T, I))
    s1 = zero_state(S, C, R)._replace(
        c=jax.random.normal(jax.random.PRNGKey(4), (S, C)) * 0.1,
        r=jax.random.normal(jax.random.PRNGKey(5), (S, R)) * 0.1)
    s2 = zero_state(S, C, R)._replace(
        c=jax.random.normal(jax.random.PRNGKey(6), (S, C)) * 0.1,
        r=jax.random.normal(jax.random.PRNGKey(7), (S, R)) * 0.1)
    return p1, p2, x, s1, s2


def _serial(p1, p2, x, s1, s2):
    r1, f1 = lstm_scan(p1, x, s1, CLIP)
    r2, f2 = lstm_scan(p2, r1, s2, CLIP)
    return r1, r2, f1, f2


@pytest.mark.parametrize("tb", [5, 4, 2, 1])
def test_wavefront_fwd_matches_serial(tb):
    p1, p2, x, s1, s2 = _setup()
    r1_ref, r2_ref, f1, f2 = _serial(p1, p2, x, s1, s2)
    d = _plan_dims(S, T, I, C, R)._replace(tb=tb)
    xp, ops1, ops2, c01, r01, c02, r02 = w2._prep2(
        p1, p2, x.swapaxes(0, 1), s1, s2, d, True)
    gifo1, c1, r1, gifo2, c2, r2 = w2._fwd2_call(
        xp, ops1, ops2, c01, r01, c02, r02, st=d.st, tb=tb,
        cell_clip=CLIP, gifo_dtype=jnp.float32, interpret=True)
    # padded-output layout: layer-1 arrays valid at [:T], layer-2 at
    # [tb:tb+T] (identity index maps + dummy boundary blocks)
    r1v, c1v = r1[:T], c1[:T]
    r2v, c2v = r2[tb:tb + T], c2[tb:tb + T]
    np.testing.assert_allclose(r1v[:, :S, :R].swapaxes(0, 1), r1_ref,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(r2v[:, :S, :R].swapaxes(0, 1), r2_ref,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(c1v[T - 1, :S, :C], f1.c,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(c2v[T - 1, :S, :C], f2.c,
                               rtol=1e-5, atol=1e-5)
    # padded LANES (columns) stay zero — zero-padded projection weights;
    # padded stream ROWS are nonzero (they see the bias), as in the
    # single-layer kernels, and are sliced away by the caller
    assert float(jnp.abs(r2v[:, :, R:]).max()) == 0.0
    assert float(jnp.abs(r1v[:, :, R:]).max()) == 0.0


def test_wavefront_infer_matches_serial():
    p1, p2, x, s1, s2 = _setup(seed=1)
    _, r2_ref, f1, f2 = _serial(p1, p2, x, s1, s2)
    d = _plan_dims(S, T, I, C, R)
    xp, ops1, ops2, c01, r01, c02, r02 = w2._prep2(
        p1, p2, x.swapaxes(0, 1), s1, s2, d, True)
    r2, c1T, r1T, c2T = w2._infer2_call(
        xp, ops1, ops2, c01, r01, c02, r02, st=d.st, tb=d.tb,
        cell_clip=CLIP, interpret=True)
    r2 = r2[d.tb:d.tb + T]
    np.testing.assert_allclose(r2[:, :S, :R].swapaxes(0, 1), r2_ref,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(c1T[:S, :C], f1.c, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(r1T[:S, :R], f1.r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(c2T[:S, :C], f2.c, rtol=1e-5, atol=1e-5)


def test_stack_compatible():
    p1, p2, _, _, _ = _setup()
    assert w2.stack_compatible(p1, p2)
    p3 = init_lstm_params(jax.random.PRNGKey(9), I, C + 8, R, 0.3)
    assert not w2.stack_compatible(p1, p3)


def test_hoist_xw_exact_parity():
    """Block-hoisted input projection (KLT_LSTM_HOIST_XW) must produce
    EXACTLY the per-timestep kernel's outputs — the same row-dot with
    the same accumulation order, just batched."""
    import jax.numpy as jnp
    from kaldi_lstm_tpu.ops import lstm_pallas as w1
    p1, p2, x, s1, s2 = _setup(seed=2)
    d = _plan_dims(S, T, I, C, R)
    ops = w1._prepare(p1, x.swapaxes(0, 1), s1, d, True)
    a = w1._fwd_call(*ops[:-1], st=d.st, tb=d.tb, cell_clip=CLIP,
                     interpret=True, hoist_xw=False)
    b = w1._fwd_call(*ops[:-1], st=d.st, tb=d.tb, cell_clip=CLIP,
                     interpret=True, hoist_xw=True)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    ia = w1._infer_call(*ops[:-1], st=d.st, tb=d.tb, cell_clip=CLIP,
                        interpret=True, hoist_xw=False)
    ib = w1._infer_call(*ops[:-1], st=d.st, tb=d.tb, cell_clip=CLIP,
                        interpret=True, hoist_xw=True)
    for x1, x2 in zip(ia, ib):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_gate_dtype_bf16_close(monkeypatch):
    """The bf16 gate-chain ablation stays numerically close to f32 (a
    timing probe, not a default — convergence gates would come first)."""
    import jax.numpy as jnp
    from kaldi_lstm_tpu.ops import lstm_pallas as w1
    p1, p2, x, s1, s2 = _setup(seed=3)
    d = _plan_dims(S, T, I, C, R)
    ops = w1._prepare(p1, x.swapaxes(0, 1), s1, d, True)
    ref = w1._infer_call(*ops[:-1], st=d.st, tb=d.tb, cell_clip=CLIP,
                         interpret=True)
    monkeypatch.setenv("KLT_LSTM_GATE_DTYPE", "bf16")
    got = w1._infer_call(*ops[:-1], st=d.st, tb=d.tb, cell_clip=CLIP,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=0.1, atol=0.05)


def test_batch_grads_matches_per_t(monkeypatch):
    """KLT_LSTM_BATCH_GRADS (block-batched weight-grad contractions)
    must reproduce the per-timestep backward's gradients (same FLOPs,
    different f32 summation order -> allclose, not bit-equal)."""
    import jax
    import jax.numpy as jnp
    from kaldi_lstm_tpu.ops.lstm_pallas import lstm_scan_pallas
    p1, _, x, s1, _ = _setup(seed=4)

    def loss(params, xx, st):
        out, fin = lstm_scan_pallas(params, xx, st, CLIP,
                                    interpret=True)
        return (jnp.sum(out * out) + jnp.sum(fin.c) +
                jnp.sum(fin.r * 0.5))

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(p1, x, s1)
    monkeypatch.setenv("KLT_LSTM_BATCH_GRADS", "1")
    g_bat = jax.grad(loss, argnums=(0, 1, 2))(p1, x, s1)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_bat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
