"""Fused affine+softmax+xent kernel vs the reference composition
(AffineTransform -> masked_xent_loss): values, stats, and full VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.ops.xent_pallas import fused_affine_xent
from kaldi_lstm_tpu.train.loss import masked_xent_loss

CASES = [
    # N, R, K, Km
    (12, 8, 20, 1),
    (50, 16, 600, 2),   # multiple class tiles after padding? K < KT: one
    (300, 24, 1100, 1),  # crosses both frame tiles and class tiles
]


def make(N, R, K, Km, seed=0):
    rng = np.random.RandomState(seed)
    r = jnp.asarray(rng.randn(N, R), jnp.float32)
    w = jnp.asarray(rng.randn(K, R) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(K) * 0.1, jnp.float32)
    ids = jnp.asarray(rng.randint(0, K, (N, Km)), jnp.int32)
    tw = jnp.asarray(rng.rand(N, Km), jnp.float32)
    tw = tw / tw.sum(-1, keepdims=True)
    mask = jnp.asarray((rng.rand(N) > 0.25), jnp.float32)
    return r, w, b, ids, tw, mask


def reference(r, w, b, ids, tw, mask):
    logits = (r @ w.T + b)[None]  # [1, N, K] for the [S, T, K] API
    return masked_xent_loss(logits, ids[None], tw[None], mask[None])


@pytest.mark.parametrize("N,R,K,Km", CASES)
def test_forward_parity(N, R, K, Km):
    args = make(N, R, K, Km)
    loss, aux = fused_affine_xent(*args, True)
    ref_loss, ref_aux = reference(*args)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(aux.xent), float(ref_aux.xent),
                               rtol=1e-5)
    np.testing.assert_allclose(float(aux.entropy), float(ref_aux.entropy),
                               rtol=1e-5)
    assert int(aux.correct) == int(ref_aux.correct)
    assert int(aux.frames) == int(ref_aux.frames)


@pytest.mark.parametrize("N,R,K,Km", CASES[:2])
def test_vjp_parity(N, R, K, Km):
    r, w, b, ids, tw, mask = make(N, R, K, Km, seed=1)

    def f_fused(r, w, b):
        return fused_affine_xent(r, w, b, ids, tw, mask, True)[0] * 1.7

    def f_ref(r, w, b):
        return reference(r, w, b, ids, tw, mask)[0] * 1.7

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(r, w, b)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(r, w, b)
    for a, e in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-5)


def test_all_masked_is_zero():
    r, w, b, ids, tw, mask = make(20, 8, 40, 1)
    zero = jnp.zeros_like(mask)
    loss, aux = fused_affine_xent(r, w, b, ids, tw, zero, True)
    assert float(loss) == 0.0 and int(aux.frames) == 0
    g = jax.grad(lambda r: fused_affine_xent(r, w, b, ids, tw, zero,
                                             True)[0])(r)
    assert float(jnp.abs(g).max()) == 0.0
