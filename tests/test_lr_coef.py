"""<LearnRateCoef> semantics: 0 freezes a tensor, 2.0 doubles its step."""

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, \
    make_train_step

PROTO = """<NnetProto>
<AffineTransform> <InputDim> 4 <OutputDim> 6 <ParamStddev> 0.1
<Softmax> <InputDim> 6 <OutputDim> 6
</NnetProto>
"""


def one_step(nnet, params):
    step = make_train_step(nnet, TrainOptions(learn_rate=0.1, momentum=0.0))
    opt = init_momentum(params)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 3, 4), jnp.float32)
    ids = jnp.asarray(rng.randint(0, 6, (2, 3, 1)), jnp.int32)
    w = jnp.ones((2, 3, 1), jnp.float32)
    mask = jnp.ones((2, 3), jnp.float32)
    flags = jnp.zeros((2,), jnp.int32)
    p2, *_ = step(jax.tree_util.tree_map(jnp.array, params), opt,
                  nnet.init_states(2), (), feats, ids, w, mask, flags,
                  jnp.float32(0.1))
    return p2


def test_zero_coef_freezes_affine():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    nnet.components[0].learn_rate_coef = 0.0
    nnet.components[0].bias_learn_rate_coef = 0.0
    p2 = one_step(nnet, params)
    np.testing.assert_array_equal(np.asarray(p2[0]["linearity"]),
                                  np.asarray(params[0]["linearity"]))
    np.testing.assert_array_equal(np.asarray(p2[0]["bias"]),
                                  np.asarray(params[0]["bias"]))


def test_coef_scales_update():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    p_base = one_step(nnet, params)
    nnet.components[0].learn_rate_coef = 2.0
    p_double = one_step(nnet, params)
    d1 = np.asarray(p_base[0]["linearity"]) - np.asarray(
        params[0]["linearity"])
    d2 = np.asarray(p_double[0]["linearity"]) - np.asarray(
        params[0]["linearity"])
    np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-5, atol=1e-8)
    # bias coef unchanged -> bias step identical
    np.testing.assert_allclose(np.asarray(p_base[0]["bias"]),
                               np.asarray(p_double[0]["bias"]), rtol=1e-6)
