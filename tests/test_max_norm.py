"""<MaxNorm> semantics: after the SGD update, AffineTransform rows whose
L2 norm exceeds max_norm are projected back onto the sphere (upstream
nnet1 AffineTransform::Update; the reference keeps the same regularizer
sketched for the LSTM at bd-nnet-lstm-projected-streams.h:534-574)."""

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, \
    make_train_step
from kaldi_lstm_tpu.train.trainer import apply_max_norm

PROTO = """<NnetProto>
<AffineTransform> <InputDim> 4 <OutputDim> 6 <ParamStddev> 2.0
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


def test_max_norm_projects_rows():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    nnet.components[0].max_norm = 1.0
    p2 = one_step(nnet, params)
    norms = np.linalg.norm(np.asarray(p2[0]["linearity"]), axis=1)
    assert np.all(norms <= 1.0 + 1e-5)
    # ParamStddev 2.0 guarantees rows started well above the sphere
    pre = np.linalg.norm(np.asarray(params[0]["linearity"]), axis=1)
    assert np.any(pre > 1.0)


def test_max_norm_zero_is_noop():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    assert nnet.components[0].max_norm == 0.0
    projected = apply_max_norm(nnet, params)
    np.testing.assert_array_equal(np.asarray(projected[0]["linearity"]),
                                  np.asarray(params[0]["linearity"]))


def test_max_norm_preserves_direction_and_small_rows():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    nnet.components[0].max_norm = 3.0
    w = np.asarray(params[0]["linearity"]).copy()
    w[0] = np.array([0.1, 0.0, 0.0, 0.0])   # small row: untouched
    w[1] = np.array([0.0, 6.0, 0.0, 0.0])   # big row: shrunk to norm 3
    params = (dict(params[0], linearity=jnp.asarray(w)),) + tuple(
        params[1:])
    out = np.asarray(apply_max_norm(nnet, params)[0]["linearity"])
    np.testing.assert_allclose(out[0], w[0], rtol=1e-6)
    np.testing.assert_allclose(out[1], [0.0, 3.0, 0.0, 0.0], rtol=1e-6)
