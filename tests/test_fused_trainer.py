"""fused_xent train step == standard train step (full model, several
steps, interpret-mode kernel on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, \
    make_train_step

PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 8 <CellDim> 10 <ParamScale> 0.1 <NumStream> 2
<AffineTransform> <InputDim> 8 <OutputDim> 21 <ParamStddev> 0.1
<Softmax> <InputDim> 21 <OutputDim> 21
</NnetProto>
"""

S, T = 2, 5


def run(fused, nsteps=3):
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    opts = TrainOptions(learn_rate=0.05, momentum=0.9, fused_xent=fused)
    step = make_train_step(nnet, opts)
    opt = init_momentum(params)
    states = nnet.init_states(S)
    lr = jnp.float32(0.05)
    for i in range(nsteps):
        r2 = np.random.RandomState(i)
        feats = jnp.asarray(r2.randn(S, T, 6), jnp.float32)
        ids = jnp.asarray(r2.randint(0, 21, (S, T, 1)), jnp.int32)
        w = jnp.ones((S, T, 1), jnp.float32)
        mask = jnp.asarray((r2.rand(S, T) > 0.2), jnp.float32)
        flags = jnp.asarray(r2.randint(0, 2, S), jnp.int32)
        params, opt, states, aux = step(
            params, opt, states, (), feats, ids, w, mask, flags, lr)
    return params, aux


def test_fused_step_matches_standard():
    p_ref, aux_ref = run(False)
    p_fused, aux_fused = run(True)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(aux_fused.xent), float(aux_ref.xent),
                               rtol=1e-4)
    assert int(aux_fused.correct) == int(aux_ref.correct)
    assert int(aux_fused.frames) == int(aux_ref.frames)
