"""Bidirectional projected LSTM component."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.ops import LstmState, lstm_scan, zero_state

PROTO = """<NnetProto>
<BLstmProjectedStreams> <InputDim> 5 <OutputDim> 12 <CellDim> 9 <ParamScale> 0.1 <NumStream> 2
<AffineTransform> <InputDim> 12 <OutputDim> 4 <ParamStddev> 0.1
<Softmax> <InputDim> 4 <OutputDim> 4
</NnetProto>
"""


def build():
    return Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))


def test_blstm_shapes_and_direction_semantics():
    nnet, params = build()
    bl = nnet.components[0]
    assert bl.recur_dim == 6 and bl.cell_dim == 9
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 5))
    y, _ = bl.apply(params[0], x)
    assert y.shape == (2, 7, 12)

    # forward half equals a plain forward scan
    st = zero_state(2, 9, 6)
    ref_f, _ = lstm_scan(params[0]["fw"], x, st)
    np.testing.assert_allclose(np.asarray(y[..., :6]), np.asarray(ref_f),
                               rtol=1e-5, atol=1e-6)
    # backward half equals a scan over reversed time, re-reversed
    ref_b, _ = lstm_scan(params[0]["bw"], x[:, ::-1], st)
    np.testing.assert_allclose(np.asarray(y[..., 6:]),
                               np.asarray(ref_b[:, ::-1]),
                               rtol=1e-5, atol=1e-6)


def test_blstm_serialization_roundtrip():
    nnet, params = build()
    for binary in (True, False):
        buf = io.BytesIO()
        nnet.write_stream(buf, params, binary=binary)
        buf.seek(0)
        nnet2, params2 = Nnet.read_stream(io.BufferedReader(buf))
        assert nnet2.components[0].token == "<BLstmProjectedStreams>"
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 5))
        y1, _ = nnet.propagate(params, x)
        y2, _ = nnet2.propagate(params2, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=1e-6, atol=1e-7)


def test_blstm_trains():
    from tests.test_trainer import make_sched
    from kaldi_lstm_tpu.train import TrainOptions, run_epoch
    proto = PROTO.replace("<InputDim> 5", "<InputDim> 6", 1).replace(
        "<OutputDim> 4", "<OutputDim> 5").replace(
        "<InputDim> 4", "<InputDim> 5")
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    opts = TrainOptions(learn_rate=0.05, momentum=0.9)
    res1 = run_epoch(nnet, params, make_sched(), opts)
    avg1 = (res1.stats.loss - res1.stats.entropy) / res1.stats.frames
    params, opt = res1.params, res1.opt_state
    for _ in range(3):
        res = run_epoch(nnet, params, make_sched(), opts, opt_state=opt)
        params, opt = res.params, res.opt_state
    avgN = (res.stats.loss - res.stats.entropy) / res.stats.frames
    assert avgN < avg1 - 0.05


def test_blstm_fused_trainer_time_major_and_input_grad():
    """The fused objective passes time_major=True and input_grad=False to
    a first-layer BLSTM (both kwargs were once only on the unidirectional
    cells); loss must match the unfused path."""
    from tests.test_trainer import make_sched
    from kaldi_lstm_tpu.train import TrainOptions, run_epoch

    proto = PROTO.replace("<InputDim> 5", "<InputDim> 6", 1).replace(
        "<OutputDim> 4", "<OutputDim> 5").replace(
        "<InputDim> 4", "<InputDim> 5")
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(2))
    p0 = jax.tree_util.tree_map(jnp.array, params)
    r_fused = run_epoch(nnet, p0, make_sched(seed=5),
                        TrainOptions(learn_rate=1e-3, momentum=0.9,
                                     fused_xent=True))
    p0 = jax.tree_util.tree_map(jnp.array, params)
    r_plain = run_epoch(nnet, p0, make_sched(seed=5),
                        TrainOptions(learn_rate=1e-3, momentum=0.9,
                                     fused_xent=False))
    assert abs(r_fused.stats.loss - r_plain.stats.loss) <= \
        1e-3 * max(1.0, abs(r_plain.stats.loss))
    for a, b in zip(jax.tree_util.tree_leaves(r_fused.params),
                    jax.tree_util.tree_leaves(r_plain.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
