"""Splice/Sigmoid/Tanh components, model surgery, CMVN estimation."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.models.components import Splice
from kaldi_lstm_tpu.tools import compute_cmvn_transform, nnet_edit, \
    nnet_initialize


def test_splice_offsets_and_roundtrip():
    nnet, params = Nnet.init_from_proto(
        "<NnetProto>\n"
        "<Splice> <InputDim> 3 <OutputDim> 15 <BuildVector> -2:-1:0:1:2\n"
        "</NnetProto>", jax.random.PRNGKey(0))
    sp = nnet.components[0]
    assert sp.offsets == [-2, -1, 0, 1, 2]
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    y, _ = nnet.propagate(params, x)
    assert y.shape == (1, 4, 15)
    # center block equals input; t=0 left context clamps to frame 0
    np.testing.assert_array_equal(y[0, :, 6:9], x[0])
    np.testing.assert_array_equal(y[0, 0, 0:3], x[0, 0])
    np.testing.assert_array_equal(y[0, 1, 0:3], x[0, 0])

    for binary in (True, False):
        buf = io.BytesIO()
        nnet.write_stream(buf, params, binary=binary)
        buf.seek(0)
        nnet2, _ = Nnet.read_stream(io.BufferedReader(buf))
        assert nnet2.components[0].offsets == sp.offsets


def test_sigmoid_tanh_apply():
    nnet, params = Nnet.init_from_proto(
        "<NnetProto>\n<Sigmoid> <InputDim> 4 <OutputDim> 4\n"
        "<Tanh> <InputDim> 4 <OutputDim> 4\n</NnetProto>",
        jax.random.PRNGKey(0))
    x = jnp.array([[[0.0, 1.0, -1.0, 2.0]]])
    y, _ = nnet.propagate(params, x)
    np.testing.assert_allclose(
        np.asarray(y[0, 0]), np.tanh(1 / (1 + np.exp(-np.asarray(x[0, 0])))),
        rtol=1e-6)


def test_nnet_edit_stack_second_lstm(tmp_path):
    """README.md Q2: insert a second LSTM between the first and the
    affine output."""
    proto = tmp_path / "p.proto"
    proto.write_text(
        "<NnetProto>\n"
        "<Transmit> <InputDim> 6 <OutputDim> 6\n"
        "<LstmProjectedStreams> <InputDim> 6 <OutputDim> 8 <CellDim> 10 "
        "<NumStream> 2\n"
        "<AffineTransform> <InputDim> 8 <OutputDim> 5\n"
        "<Softmax> <InputDim> 5 <OutputDim> 5\n"
        "</NnetProto>\n")
    assert nnet_initialize.main([str(proto), f"{tmp_path}/a.nnet"]) == 0
    assert nnet_edit.main([
        f"{tmp_path}/a.nnet", f"{tmp_path}/b.nnet", "--insert-at", "2",
        "--proto-line",
        "<LstmProjectedStreams> <InputDim> 8 <OutputDim> 8 <CellDim> 10 "
        "<NumStream> 2"]) == 0
    nnet, params = Nnet.read(f"{tmp_path}/b.nnet")
    toks = [c.token for c in nnet.components]
    assert toks == ["<Transmit>", "<LstmProjectedStreams>",
                    "<LstmProjectedStreams>", "<AffineTransform>",
                    "<Softmax>"]
    y, _ = nnet.propagate(params, jnp.ones((2, 4, 6)),
                          nnet.init_states(2))
    assert y.shape == (2, 4, 5)

    assert nnet_edit.main([f"{tmp_path}/b.nnet", f"{tmp_path}/c.nnet",
                           "--remove-at", "0"]) == 0
    nnet3, _ = Nnet.read(f"{tmp_path}/c.nnet")
    assert len(nnet3) == 4


def test_compute_cmvn(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.randn(500, 4) * np.array([1.0, 2.0, 0.5, 3.0]) + \
        np.array([1.0, -2.0, 0.0, 10.0])
    with MatrixWriter(f"ark:{tmp_path}/f.ark") as w:
        for i in range(5):
            w.write(f"u{i}", data[i * 100:(i + 1) * 100].astype(np.float32))
    assert compute_cmvn_transform.main(
        [f"ark:{tmp_path}/f.ark", f"{tmp_path}/t.nnet"]) == 0
    nnet, params = Nnet.read(f"{tmp_path}/t.nnet")
    y, _ = nnet.propagate(params, jnp.asarray(data[None], jnp.float32))
    out = np.asarray(y[0])
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(0), 1.0, atol=1e-3)
