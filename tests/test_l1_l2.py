"""--l1-penalty / --l2-penalty: upstream NnetTrainOptions regularization
(nnet-affine-transform.h Update + cu-math RegularizeL1 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, make_train_step
from kaldi_lstm_tpu.train.optim import momentum_update

PROTO = """<NnetProto>
<AffineTransform> <InputDim> 5 <OutputDim> 7 <ParamStddev> 0.5
<Softmax> <InputDim> 7 <OutputDim> 7
</NnetProto>
"""


def ref_update(w, g, c, lr, mmt, l1, l2, n, reg):
    """Element-loop reimplementation of upstream AffineTransform::Update
    order: corr accumulate; l2 decay of old weights; RegularizeL1 on
    (weights, corr); w -= lr*corr."""
    w = w.copy().astype(np.float64)
    c = g + mmt * c
    c = c.astype(np.float64)
    if reg and l2 != 0.0:
        w -= lr * l2 * n * w
    if reg and l1 != 0.0:
        l1v = lr * l1 * n
        for i in np.ndindex(w.shape):
            if w[i] == 0.0:
                continue
            l1_signed = l1v if w[i] > 0 else -l1v
            before = w[i]
            after = w[i] - lr * c[i] - l1_signed
            if (after > 0.0) != (before > 0.0):
                w[i] = 0.0
                c[i] = 0.0
            else:
                w[i] -= l1_signed
    return w - lr * c, c


def test_momentum_update_l2_matches_reference():
    rng = np.random.RandomState(0)
    w = rng.randn(4, 3).astype(np.float32)
    g = rng.randn(4, 3).astype(np.float32)
    c0 = rng.randn(4, 3).astype(np.float32)
    params = ({"linearity": jnp.asarray(w)},)
    grads = ({"linearity": jnp.asarray(g)},)
    from kaldi_lstm_tpu.train.optim import MomentumState
    opt = MomentumState(corr=({"linearity": jnp.asarray(c0)},))
    lr, mmt, l2, n = 0.1, 0.9, 0.02, 15
    newp, newo = momentum_update(params, grads, opt, lr, mmt,
                                 l2_penalty=l2, num_frames=n,
                                 reg_mask=({"linearity": 1.0},))
    ref_w, ref_c = ref_update(w, g, c0, lr, mmt, 0.0, l2, n, True)
    np.testing.assert_allclose(np.asarray(newp[0]["linearity"]), ref_w,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(newo.corr[0]["linearity"]),
                               ref_c, rtol=1e-5)
    # mask off -> plain momentum SGD
    newp2, _ = momentum_update(params, grads, opt, lr, mmt,
                               l2_penalty=l2, num_frames=n,
                               reg_mask=({"linearity": 0.0},))
    np.testing.assert_allclose(np.asarray(newp2[0]["linearity"]),
                               w - lr * (g + mmt * c0), rtol=1e-5)


def test_momentum_update_l1_regularize_semantics():
    """RegularizeL1: shrink toward zero; zero-crossing clamps weight AND
    corr to 0; exact zeros are never regularized."""
    w = np.array([[0.5, -0.5, 0.001, 0.0, 2.0]], np.float32)
    g = np.array([[0.0, 0.0, 0.0, 1.0, 10.0]], np.float32)
    c0 = np.zeros_like(w)
    lr, l1, n = 0.1, 0.05, 4  # l1v = lr*l1*n = 0.02
    from kaldi_lstm_tpu.train.optim import MomentumState
    newp, newo = momentum_update(
        ({"linearity": jnp.asarray(w)},), ({"linearity": jnp.asarray(g)},),
        MomentumState(corr=({"linearity": jnp.asarray(c0)},)), lr, 0.0,
        l1_penalty=l1, num_frames=n, reg_mask=({"linearity": 1.0},))
    got = np.asarray(newp[0]["linearity"])[0]
    corr = np.asarray(newo.corr[0]["linearity"])[0]
    ref_w, ref_c = ref_update(w, g, c0, lr, 0.0, l1, 0.0, n, True)
    np.testing.assert_allclose(got, ref_w[0], rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(corr, ref_c[0], rtol=1e-5)
    assert got[0] == np.float32(0.5 - 0.02)      # shrink toward zero
    assert got[1] == np.float32(-0.5 + 0.02)
    assert got[2] == 0.0 and corr[2] == 0.0      # crossing -> clamp both
    assert got[3] == np.float32(-lr * 1.0)       # exact zero: no l1
    np.testing.assert_allclose(got[4], 2.0 - 0.02 - lr * 10.0, rtol=1e-5)


def test_train_step_l2_only_touches_affine_linearity():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    S, T = 3, 4
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(S, T, 5), np.float32)
    ids = jnp.asarray(rng.randint(0, 7, (S, T, 1)), np.int32)
    w = jnp.ones((S, T, 1), np.float32)
    mask = jnp.ones((S, T), np.float32)
    flags = jnp.zeros((S,), np.int32)

    def run(l2):
        opts = TrainOptions(learn_rate=0.01, momentum=0.0, l2_penalty=l2,
                            fused_xent=False)
        step = make_train_step(nnet, opts)
        p = jax.tree_util.tree_map(jnp.array, params)
        st = nnet.init_states(S)
        p, _, _, _ = step(p, init_momentum(p), st, (), feats, ids, w,
                          mask, flags, jnp.float32(0.01))
        return p

    p0, p1 = run(0.0), run(0.3)
    lin0 = np.asarray(p0[0]["linearity"])
    lin1 = np.asarray(p1[0]["linearity"])
    # l2 shifts the linearity by exactly -lr*l2*num_frames*W_old
    expect = lin0 - 0.01 * 0.3 * (S * T) * np.asarray(params[0]["linearity"])
    np.testing.assert_allclose(lin1, expect, rtol=1e-4, atol=1e-6)
    # bias is not regularized
    np.testing.assert_allclose(np.asarray(p0[0]["bias"]),
                               np.asarray(p1[0]["bias"]), rtol=1e-6)
