"""Standalone <Dropout> and <LogSoftmax> components (nnet1 subset)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.models.components import Dropout, LogSoftmax

PROTO = """<NnetProto>
<AffineTransform> <InputDim> 6 <OutputDim> 16 <ParamStddev> 0.2
<Sigmoid> <InputDim> 16 <OutputDim> 16
<Dropout> <InputDim> 16 <OutputDim> 16 <DropoutRate> 0.4
<AffineTransform> <InputDim> 16 <OutputDim> 5 <ParamStddev> 0.2
<Softmax> <InputDim> 5 <OutputDim> 5
</NnetProto>
"""


def test_dropout_train_vs_eval():
    c = Dropout(8, 8, dropout_rate=0.5)
    x = jnp.ones((4, 10, 8))
    # eval / no rng: exact identity
    y, _ = c.apply({}, x, train=False, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    y, _ = c.apply({}, x, train=True, rng=None)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # train: inverted dropout -> zeros and 1/keep scaling, mean ~ 1
    y = np.asarray(c.apply({}, x, train=True,
                           rng=jax.random.PRNGKey(1))[0])
    vals = sorted(np.unique(y).tolist())
    assert len(vals) == 2 and vals[0] == 0.0
    assert vals[1] == pytest.approx(2.0)
    assert abs(y.mean() - 1.0) < 0.1


def test_dropout_serialization_roundtrip(tmp_path):
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    assert nnet.components[2].dropout_rate == pytest.approx(0.4)
    f = str(tmp_path / "m.nnet")
    nnet.write(f, params)
    n2, p2 = Nnet.read(f)
    assert isinstance(n2.components[2], Dropout)
    assert n2.components[2].dropout_rate == pytest.approx(0.4)
    # text roundtrip too
    ft = str(tmp_path / "m.txt")
    nnet.write(ft, params, binary=False)
    n3, _ = Nnet.read(ft)
    assert n3.components[2].dropout_rate == pytest.approx(0.4)
    # <DropoutRetention> alias in proto
    n4, _ = Nnet.init_from_proto(PROTO.replace(
        "<DropoutRate> 0.4", "<DropoutRetention> 0.75"),
        jax.random.PRNGKey(0))
    assert n4.components[2].dropout_rate == pytest.approx(0.25)


def test_dropout_identity_at_decode_and_stochastic_in_training():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(3, 7, 6), jnp.float32)
    # feedforward (decode) is deterministic: two calls agree
    y1 = nnet.feedforward(params, x)
    y2 = nnet.feedforward(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # training propagate with different rngs differs
    t1, _ = nnet.propagate(params, x, rng=jax.random.PRNGKey(1),
                           train=True)
    t2, _ = nnet.propagate(params, x, rng=jax.random.PRNGKey(2),
                           train=True)
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_log_softmax_component():
    c = LogSoftmax(5, 5)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 5), jnp.float32)
    y, _ = c.apply({}, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(jax.nn.log_softmax(x, axis=-1)),
        rtol=1e-6)
    # serialization token
    nnet = Nnet([c])
    import io as _io
    from kaldi_lstm_tpu.io.kaldi_io import KaldiOutput
    buf = _io.BytesIO()
    nnet.write_stream(buf, ({},))
    buf.seek(0)
    n2, _ = Nnet.read_stream(buf)
    assert isinstance(n2.components[0], LogSoftmax)


def test_frmshuff_trains_dropout_net(tmp_path):
    """DNN with a Dropout layer trains through nnet_train_frmshuff and
    the loss decreases."""
    from kaldi_lstm_tpu.io.kaldi_io import (MatrixWriter, PosteriorWriter)
    from kaldi_lstm_tpu.tools.nnet_initialize import main as init_main
    from kaldi_lstm_tpu.tools.nnet_train_frmshuff import main as frm_main
    rng = np.random.RandomState(0)
    W = rng.randn(6, 5)
    with MatrixWriter(f"ark,scp:{tmp_path}/f.ark,{tmp_path}/f.scp") as fw, \
            PosteriorWriter(f"ark:{tmp_path}/p.ark") as pw:
        for u in range(10):
            x = rng.randn(50, 6).astype(np.float32)
            y = (x @ W).argmax(-1)
            fw.write(f"u{u}", x)
            pw.write(f"u{u}", [[(int(t), 1.0)] for t in y])
    (tmp_path / "nnet.proto").write_text(PROTO)
    assert init_main([str(tmp_path / "nnet.proto"),
                      str(tmp_path / "nnet.init")]) == 0
    assert frm_main([f"scp:{tmp_path}/f.scp", f"ark:{tmp_path}/p.ark",
                     str(tmp_path / "nnet.init"),
                     str(tmp_path / "nnet.it1"),
                     "--learn-rate", "0.02", "--minibatch-size", "64",
                     "--randomizer-size", "512"]) == 0
    # CV loss of trained model beats the random init
    def cv(model):
        import subprocess
        from kaldi_lstm_tpu.train.loss import LossStats
        from kaldi_lstm_tpu.tools.nnet_train_frmshuff import main as m
        import contextlib, io as _io
        err = _io.StringIO()
        with contextlib.redirect_stderr(err):
            rc = m([f"scp:{tmp_path}/f.scp", f"ark:{tmp_path}/p.ark",
                    str(model), "--cross-validate=true"])
        assert rc == 0
        import re
        match = re.search(r"AvgLoss: ([\d.eE+-]+)", err.getvalue())
        assert match, err.getvalue()
        return float(match.group(1))

    assert cv(tmp_path / "nnet.it1") < cv(tmp_path / "nnet.init")
