"""Train-state checkpointing: bit-exact resume including momentum, plus
the per-utterance (standard-variant) trainer CLI."""

import numpy as np
import jax
import pytest

from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter, PosteriorWriter
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import StreamScheduler, TrainOptions, run_epoch
from kaldi_lstm_tpu.train.checkpoint import load_train_state, \
    save_train_state
from kaldi_lstm_tpu.io.kaldi_io import RandomAccessPosteriorReader, \
    SequentialMatrixReader
from kaldi_lstm_tpu.tools import nnet_initialize, nnet_train_perutt, \
    train_lstm_streams

PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 8 <CellDim> 10 <ParamScale> 0.05 <NumStream> 2
<AffineTransform> <InputDim> 8 <OutputDim> 5 <ParamStddev> 0.1
<Softmax> <InputDim> 5 <OutputDim> 5
</NnetProto>
"""

STD_PROTO = """<NnetProto>
<TimeShift> <InputDim> 6 <OutputDim> 6 <Shift> 2
<LstmProjected> <InputDim> 6 <OutputDim> 8 <CellDim> 10 <ParamScale> 0.05
<AffineTransform> <InputDim> 8 <OutputDim> 5 <ParamStddev> 0.1
<Softmax> <InputDim> 5 <OutputDim> 5
</NnetProto>
"""


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("klt_ckpt")
    rng = np.random.RandomState(0)
    W = rng.randn(6, 5)
    with MatrixWriter(f"ark,scp:{d}/feats.ark,{d}/feats.scp") as fw, \
            PosteriorWriter(f"ark:{d}/post.ark") as pw:
        for i in range(5):
            L = rng.randint(10, 30)
            f = rng.randn(L, 6).astype(np.float32)
            fw.write(f"utt{i}", f)
            pw.write(f"utt{i}", [[(int(l), 1.0)]
                                 for l in (f @ W).argmax(-1)])
    return d


def test_state_roundtrip_bit_exact(tmp_path, data_dir):
    d = str(data_dir)
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))

    def sched():
        return StreamScheduler(
            iter(SequentialMatrixReader(f"scp:{d}/feats.scp")),
            RandomAccessPosteriorReader(f"ark:{d}/post.ark"),
            feat_dim=6, num_stream=2, batch_size=5, targets_delay=0)

    opts = TrainOptions(learn_rate=0.02, momentum=0.9)
    r1 = run_epoch(nnet, params, sched(), opts)
    save_train_state(str(tmp_path / "st.npz"), r1.params, r1.opt_state,
                     meta={"iter": 1})

    # continue WITHOUT checkpoint
    r2a = run_epoch(nnet, r1.params, sched(), opts, opt_state=r1.opt_state)

    # continue FROM checkpoint
    nnet2, params2 = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    lp, lo, meta = load_train_state(str(tmp_path / "st.npz"), params2)
    assert meta == {"iter": 1}
    r2b = run_epoch(nnet2, lp, sched(), opts, opt_state=lo)

    for a, b in zip(jax.tree_util.tree_leaves(r2a.params),
                    jax.tree_util.tree_leaves(r2b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert r2a.stats.loss == r2b.stats.loss


def test_trainer_cli_state_resume(tmp_path, data_dir):
    d = str(data_dir)
    proto = tmp_path / "nnet.proto"
    proto.write_text(PROTO)
    assert nnet_initialize.main([str(proto), f"{tmp_path}/nnet.init"]) == 0
    assert train_lstm_streams.main([
        f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
        f"{tmp_path}/nnet.init", f"{tmp_path}/nnet.iter1",
        "--learn-rate=0.02", "--num-stream=2", "--batch-size=5",
        "--targets-delay=0", f"--state-out={tmp_path}/state1.npz"]) == 0
    assert train_lstm_streams.main([
        f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
        f"{tmp_path}/nnet.iter1", f"{tmp_path}/nnet.iter2",
        "--learn-rate=0.02", "--num-stream=2", "--batch-size=5",
        "--targets-delay=0", f"--state-in={tmp_path}/state1.npz"]) == 0


def test_perutt_trainer(tmp_path, data_dir):
    d = str(data_dir)
    proto = tmp_path / "std.proto"
    proto.write_text(STD_PROTO)
    assert nnet_initialize.main([str(proto), f"{tmp_path}/std.init"]) == 0
    assert nnet_train_perutt.main([
        f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
        f"{tmp_path}/std.init", f"{tmp_path}/std.iter1",
        "--learn-rate=0.02", "--length-bucket=16"]) == 0
    # cross-validate mode runs and does not need model_out
    assert nnet_train_perutt.main([
        f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
        f"{tmp_path}/std.iter1", "--cross-validate=true",
        "--length-bucket=16"]) == 0


def test_monitor_first_batch_runs(data_dir, capsys):
    """verbose>=1 prints InfoPropagate/InfoGradient moment dumps."""
    import kaldi_lstm_tpu.utils.logging as klog
    d = str(data_dir)
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    sched = StreamScheduler(
        iter(SequentialMatrixReader(f"scp:{d}/feats.scp")),
        RandomAccessPosteriorReader(f"ark:{d}/post.ark"),
        feat_dim=6, num_stream=2, batch_size=5, targets_delay=0)
    klog.set_verbose_level(1)
    try:
        run_epoch(nnet, params, sched, TrainOptions(learn_rate=0.01),
                  monitor_verbose=1)
    finally:
        klog.set_verbose_level(0)
    err = capsys.readouterr().err
    assert "Forward propagation buffer content" in err
    assert "Backward propagation buffer content" in err
    assert "w_gifo_x_corr_" in err
