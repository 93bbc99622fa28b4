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


LSTM_PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 4 <OutputDim> 5 <CellDim> 6 <ParamScale> 0.1 <NumStream> 2
<AffineTransform> <InputDim> 5 <OutputDim> 6 <ParamStddev> 0.1
<Softmax> <InputDim> 6 <OutputDim> 6
</NnetProto>
"""


def test_zero_coef_freezes_lstm_layer():
    """<LearnRateCoef> 0 on an LSTMP freezes every tensor of the layer
    while the rest of the net still trains (the FAQ Q2 freeze-stacking
    flow)."""
    nnet, params = Nnet.init_from_proto(LSTM_PROTO, jax.random.PRNGKey(1))
    nnet.components[0].learn_rate_coef = 0.0
    p2 = one_step(nnet, params)
    for a, b in zip(jax.tree_util.tree_leaves(params[0]),
                    jax.tree_util.tree_leaves(p2[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the affine still moved
    assert np.abs(np.asarray(p2[1]["linearity"])
                  - np.asarray(params[1]["linearity"])).max() > 0


def test_lstm_coef_serializes_and_proto_inits(tmp_path):
    nnet, params = Nnet.init_from_proto(LSTM_PROTO, jax.random.PRNGKey(1))
    nnet.components[0].learn_rate_coef = 0.25
    nnet.write(f"{tmp_path}/m.nnet", params)
    n2, p2 = Nnet.read(f"{tmp_path}/m.nnet")
    assert n2.components[0].learn_rate_coef == 0.25
    # coef 1.0 stays OFF the LSTM's wire section (old files
    # byte-identical; the affine always writes its coef, nnet1 format)
    nnet.components[0].learn_rate_coef = 1.0
    nnet.write(f"{tmp_path}/m1.nnet", params)
    raw = open(f"{tmp_path}/m1.nnet", "rb").read()
    assert raw.count(b"<LearnRateCoef>") == 1
    proto = LSTM_PROTO.replace("<ParamScale> 0.1",
                               "<ParamScale> 0.1 <LearnRateCoef> 0.5")
    n3, _ = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    assert n3.components[0].learn_rate_coef == 0.5


def test_nnet_edit_set_learn_rate_coef(tmp_path):
    from kaldi_lstm_tpu.tools import nnet_edit, nnet_initialize
    proto = tmp_path / "p"
    proto.write_text(LSTM_PROTO)
    assert nnet_initialize.main([str(proto), f"{tmp_path}/a.nnet"]) == 0
    assert nnet_edit.main([f"{tmp_path}/a.nnet", f"{tmp_path}/b.nnet",
                           "--set-learn-rate-coef", "0=0",
                           "--set-learn-rate-coef", "1=0.5"]) == 0
    n, _ = Nnet.read(f"{tmp_path}/b.nnet")
    assert n.components[0].learn_rate_coef == 0.0
    assert n.components[1].learn_rate_coef == 0.5
    assert n.components[1].bias_learn_rate_coef == 0.5
    # non-updatable target errors
    assert nnet_edit.main([f"{tmp_path}/a.nnet", f"{tmp_path}/c.nnet",
                           "--set-learn-rate-coef", "2=0"]) == 1
    # out-of-range index is an ERROR, not a silent modulo wrap onto a
    # different layer (ADVICE r3); negative indexing stays supported
    assert nnet_edit.main([f"{tmp_path}/a.nnet", f"{tmp_path}/d.nnet",
                           "--set-learn-rate-coef", "7=0"]) == 1
    assert nnet_edit.main([f"{tmp_path}/a.nnet", f"{tmp_path}/e.nnet",
                           "--set-learn-rate-coef=-3=0.5"]) == 0
    n, _ = Nnet.read(f"{tmp_path}/e.nnet")
    assert n.components[0].learn_rate_coef == 0.5


def test_nnet_edit_set_dropout(tmp_path):
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools import nnet_edit, nnet_initialize
    proto = tmp_path / "p"
    proto.write_text(LSTM_PROTO)
    assert nnet_initialize.main([str(proto), f"{tmp_path}/a.nnet"]) == 0
    assert nnet_edit.main([f"{tmp_path}/a.nnet", f"{tmp_path}/b.nnet",
                           "--set-dropout", "0=0.2"]) == 0
    n, _ = Nnet.read(f"{tmp_path}/b.nnet")
    assert abs(n.components[0].dropout_rate - 0.2) < 1e-6  # f32 wire
    # no-dropout component, out-of-range index, bad rate -> errors
    assert nnet_edit.main([f"{tmp_path}/a.nnet", f"{tmp_path}/c.nnet",
                           "--set-dropout", "2=0.2"]) == 1
    assert nnet_edit.main([f"{tmp_path}/a.nnet", f"{tmp_path}/d.nnet",
                           "--set-dropout", "9=0.2"]) == 1
    assert nnet_edit.main([f"{tmp_path}/a.nnet", f"{tmp_path}/e.nnet",
                           "--set-dropout", "0=1.5"]) == 1
