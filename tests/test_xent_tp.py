"""Tensor-parallel fused xent (shard_map + flash kernel) vs the plain
logits-based loss: forward numbers, stats, and all gradients must match
on the 8-device virtual CPU mesh, for DPxTP, TP-only and DP-only
layouts; and end-to-end through the sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.parallel import MeshPlan, make_mesh, \
    make_sharded_train_step
from kaldi_lstm_tpu.parallel.xent_tp import make_tp_fused_xent
from kaldi_lstm_tpu.train.loss import masked_xent_loss

N, R, K = 24, 10, 36


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    r = jnp.asarray(rng.randn(N, R), jnp.float32)
    w = jnp.asarray(rng.randn(K, R) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(K) * 0.1, jnp.float32)
    ids = jnp.asarray(rng.randint(0, K, (N, 2)), jnp.int32)
    tw = jnp.asarray(rng.rand(N, 2), jnp.float32)
    tw = tw / jnp.sum(tw, -1, keepdims=True)
    mask = jnp.asarray((rng.rand(N) > 0.2), jnp.float32)
    return r, w, b, ids, tw, mask


def ref_loss(r, w, b, ids, tw, mask):
    logits = r @ w.T + b
    return masked_xent_loss(logits, ids, tw, mask)


@pytest.mark.parametrize("data,model", [(2, 4), (1, 4), (4, 1), (2, 2)])
def test_tp_fused_parity(data, model):
    mesh = make_mesh(data=data, model=model)
    fused = make_tp_fused_xent(mesh, interpret=True)
    r, w, b, ids, tw, mask = make_inputs()

    (loss_f, aux_f) = jax.jit(fused)(r, w, b, ids, tw, mask)
    (loss_r, aux_r) = ref_loss(r, w, b, ids, tw, mask)
    np.testing.assert_allclose(loss_f, loss_r, rtol=1e-5)
    np.testing.assert_allclose(aux_f.xent, aux_r.xent, rtol=1e-5)
    np.testing.assert_allclose(aux_f.entropy, aux_r.entropy, rtol=1e-5)
    assert int(aux_f.correct) == int(aux_r.correct)
    assert int(aux_f.frames) == int(aux_r.frames)

    gf = jax.jit(jax.grad(lambda *a: fused(*a)[0], argnums=(0, 1, 2)))(
        r, w, b, ids, tw, mask)
    gr = jax.grad(lambda *a: ref_loss(*a)[0], argnums=(0, 1, 2))(
        r, w, b, ids, tw, mask)
    for a, e in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-5, atol=2e-6)


def test_tp_fused_argmax_first_max_across_shards():
    """Equal maxima in different shards: the FIRST (lowest-index) class
    must win, FindRowMaxId semantics."""
    mesh = make_mesh(data=1, model=4)
    fused = make_tp_fused_xent(mesh, interpret=True)
    r = jnp.zeros((8, R), jnp.float32)
    w = jnp.zeros((K, R), jnp.float32)
    b = jnp.zeros((K,), jnp.float32)  # ALL logits equal -> argmax = 0
    ids = jnp.zeros((8, 1), jnp.int32)  # target 0 => all correct
    tw = jnp.ones((8, 1), jnp.float32)
    mask = jnp.ones((8,), jnp.float32)
    _, aux = jax.jit(fused)(r, w, b, ids, tw, mask)
    assert int(aux.correct) == 8


def test_sharded_step_fused_matches_unfused():
    """Full sharded train step with the fused TP loss == the same step
    with the GSPMD unfused loss (params after 3 updates)."""
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.train import TrainOptions, init_momentum

    PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 8 <CellDim> 16 <ParamScale> 0.1 <NumStream> 8
<AffineTransform> <InputDim> 8 <OutputDim> 36 <ParamStddev> 0.1
<Softmax> <InputDim> 36 <OutputDim> 36
</NnetProto>"""
    S, T = 8, 5
    nnet, params0 = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, model=4)
    plan = MeshPlan(mesh, nnet)

    def run(fused):
        params = jax.tree_util.tree_map(jnp.array, params0)
        opts = TrainOptions(learn_rate=0.05, momentum=0.9,
                            fused_xent=fused)
        step = make_sharded_train_step(
            nnet, opts, plan, params_example=params,
            states_example=nnet.init_states(S))
        opt = init_momentum(params)
        states = nnet.init_states(S)
        rng = np.random.RandomState(7)
        for i in range(3):
            feats = jnp.asarray(rng.randn(S, T, 6), jnp.float32)
            ids = jnp.asarray(rng.randint(0, 36, (S, T, 1)), jnp.int32)
            w1 = jnp.ones((S, T, 1), jnp.float32)
            mask = jnp.ones((S, T), jnp.float32)
            flags = jnp.zeros((S,), jnp.int32)
            params, opt, states, aux = step(
                params, opt, states, (), feats, ids, w1, mask, flags,
                jnp.float32(0.05))
        return params, aux

    p_fused, aux_fused = run(True)
    p_ref, aux_ref = run(False)
    np.testing.assert_allclose(float(aux_fused.xent), float(aux_ref.xent),
                               rtol=1e-4)
    for a, e in zip(jax.tree_util.tree_leaves(p_fused),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-5)
