"""Masked xent loss: gradient = (softmax - t) * mask, stats vs a dense
numpy reference of Xent::EvalMasked (nnet-loss.cc:76-164)."""

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.train.loss import (
    LossStats,
    masked_xent_loss,
    posterior_to_sparse,
)

S, T, K = 2, 5, 7


def make_batch(seed=0, kmax=2):
    rng = np.random.RandomState(seed)
    logits = rng.randn(S, T, K).astype(np.float32)
    ids = rng.randint(0, K, (S, T, kmax)).astype(np.int32)
    w = rng.rand(S, T, kmax).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    mask = (rng.rand(S, T) > 0.3).astype(np.float32)
    return jnp.asarray(logits), jnp.asarray(ids), jnp.asarray(w), \
        jnp.asarray(mask)


def dense_target(ids, w):
    t = np.zeros((S, T, K), np.float32)
    for s in range(S):
        for tt in range(T):
            for k in range(ids.shape[-1]):
                t[s, tt, ids[s, tt, k]] += w[s, tt, k]
    return t


def test_grad_is_masked_softmax_minus_target():
    logits, ids, w, mask = make_batch()
    g = jax.grad(lambda l: masked_xent_loss(l, ids, w, mask)[0])(logits)
    y = jax.nn.softmax(logits, -1)
    t = dense_target(np.asarray(ids), np.asarray(w))
    expect = (np.asarray(y) - t) * np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5, atol=1e-6)


def test_stats_match_dense_reference():
    logits, ids, w, mask = make_batch(seed=1)
    _, aux = masked_xent_loss(logits, ids, w, mask)
    y = np.asarray(jax.nn.softmax(logits, -1))
    t = dense_target(np.asarray(ids), np.asarray(w))
    m = np.asarray(mask)
    ref_xent = -np.sum(t * np.log(y) * m[..., None])
    ref_ent = -np.sum(t * np.log(np.maximum(t, 1e-20)) * m[..., None])
    ref_correct = int(np.sum((y.argmax(-1) == t.argmax(-1)) * (m == 1)))
    np.testing.assert_allclose(float(aux.xent), ref_xent, rtol=1e-4)
    np.testing.assert_allclose(float(aux.entropy), ref_ent, rtol=1e-4)
    assert int(aux.correct) == ref_correct
    assert int(aux.frames) == int(m.sum())


def test_fully_masked_frame_contributes_nothing():
    logits, ids, w, mask = make_batch(seed=2)
    zero_mask = jnp.zeros_like(mask)
    loss, aux = masked_xent_loss(logits, ids, w, zero_mask)
    assert float(loss) == 0.0
    assert int(aux.frames) == 0
    g = jax.grad(lambda l: masked_xent_loss(l, ids, w, zero_mask)[0])(logits)
    assert float(jnp.abs(g).max()) == 0.0


def test_posterior_to_sparse():
    posts = [
        [[(1, 1.0)], [(2, 0.5), (3, 0.5)]],
        [[(0, 1.0)]],
    ]
    ids, w = posterior_to_sparse(posts, max_entries=2)
    assert ids.shape == (2, 2, 2)
    assert ids[0, 1, 0] == 2 and w[0, 1, 1] == 0.5
    assert w[1, 1].sum() == 0.0  # padding frame


def test_report_format():
    stats = LossStats("Xent")
    from kaldi_lstm_tpu.train.loss import LossAux
    stats.add(LossAux(xent=jnp.float32(100.0), entropy=jnp.float32(10.0),
                      correct=jnp.int32(50), frames=jnp.int32(80)))
    rep = stats.report()
    assert "AvgLoss:" in rep and "(Xent)" in rep
    assert "FRAME_ACCURACY >> 62.5% <<" in rep


def test_kmax1_fast_path_matches_general_gather():
    """The Km==1 static special-case (skip the take_along_axis/argmax
    pick; BENCH_NOTES round 5 fusion.42) must equal the general path:
    pad the same targets to Km=2 with a zero-weight entry and compare
    loss + stats exactly."""
    logits, ids, w, mask = make_batch(seed=3, kmax=1)
    loss1, aux1 = masked_xent_loss(logits, ids, w, mask)
    ids2 = jnp.concatenate([ids, jnp.zeros_like(ids)], -1)
    w2 = jnp.concatenate([w, jnp.zeros_like(w)], -1)
    loss2, aux2 = masked_xent_loss(logits, ids2, w2, mask)
    assert float(loss1) == float(loss2)
    assert int(aux1.correct) == int(aux2.correct)
    assert float(aux1.entropy) == float(aux2.entropy)

    from kaldi_lstm_tpu.ops.xent_pallas import fused_affine_xent
    rng = np.random.RandomState(7)
    N, R = S * T, 6
    r = jnp.asarray(rng.randn(N, R).astype(np.float32))
    wk = jnp.asarray(rng.randn(K, R).astype(np.float32))
    b = jnp.asarray(rng.randn(K).astype(np.float32))
    fids = ids.reshape(N, 1)
    fw = w.reshape(N, 1)
    fm = mask.reshape(N)
    (l1, a1) = fused_affine_xent(r, wk, b, fids, fw, fm, True)
    (l2, a2) = fused_affine_xent(r, wk, b, ids2.reshape(N, 2),
                                 w2.reshape(N, 2), fm, True)
    assert float(l1) == float(l2)
    assert int(a1.correct) == int(a2.correct)
