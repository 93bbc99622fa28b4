"""End-to-end CLI tests over synthetic ark data: initialize -> train ->
cross-validate -> convert -> forward (the full reference workflow,
SURVEY.md §3.1-3.3)."""

import io
import os

import numpy as np
import pytest

from kaldi_lstm_tpu.io.kaldi_io import (
    MatrixWriter,
    PosteriorWriter,
    SequentialMatrixReader,
    RandomAccessPosteriorReader,
)
from kaldi_lstm_tpu.tools import (
    nnet_copy,
    nnet_forward,
    nnet_initialize,
    train_lstm_streams,
)

PROTO = """<NnetProto>
<Transmit> <InputDim> 6 <OutputDim> 6
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 8 <CellDim> 10 <ParamScale> 0.05 <NumStream> 2
<AffineTransform> <InputDim> 8 <OutputDim> 5 <ParamStddev> 0.1
<Softmax> <InputDim> 5 <OutputDim> 5
</NnetProto>
"""


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("klt_e2e")
    rng = np.random.RandomState(0)
    W = rng.randn(6, 5)
    with MatrixWriter(f"ark,scp:{d}/feats.ark,{d}/feats.scp") as fw, \
            PosteriorWriter(f"ark:{d}/post.ark") as pw:
        for i in range(6):
            L = rng.randint(10, 25)
            f = rng.randn(L, 6).astype(np.float32)
            labels = (f @ W).argmax(-1)
            fw.write(f"utt{i}", f)
            pw.write(f"utt{i}", [[(int(l), 1.0)] for l in labels])
    with open(d / "nnet.proto", "w") as f:
        f.write(PROTO)
    return d


def test_ark_scp_readers(data_dir):
    d = data_dir
    seq = dict(SequentialMatrixReader(f"ark:{d}/feats.ark"))
    via_scp = dict(SequentialMatrixReader(f"scp:{d}/feats.scp"))
    assert set(seq) == set(via_scp) == {f"utt{i}" for i in range(6)}
    for k in seq:
        np.testing.assert_array_equal(seq[k], via_scp[k])
    posts = RandomAccessPosteriorReader(f"ark:{d}/post.ark")
    assert posts.has_key("utt0")
    assert len(posts.value("utt0")) == seq["utt0"].shape[0]


def test_initialize_train_cv_forward(data_dir):
    d = str(data_dir)
    assert nnet_initialize.main([f"{d}/nnet.proto", f"{d}/nnet.init",
                                 "--seed=7"]) == 0
    assert os.path.exists(f"{d}/nnet.init")

    # one training iteration
    assert train_lstm_streams.main([
        f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
        f"{d}/nnet.init", f"{d}/nnet.iter1",
        "--learn-rate=0.05", "--momentum=0.9", "--num-stream=2",
        "--batch-size=5", "--targets-delay=0"]) == 0
    assert os.path.exists(f"{d}/nnet.iter1")

    # cross-validation (no model-out)
    assert train_lstm_streams.main([
        f"scp:{d}/feats.scp", f"ark:{d}/post.ark", f"{d}/nnet.iter1",
        "--cross-validate=true", "--num-stream=2", "--batch-size=5",
        "--targets-delay=0"]) == 0

    # google -> standard conversion for decoding
    assert nnet_copy.main([f"{d}/nnet.iter1", f"{d}/nnet.final",
                           "--to-standard", "--time-shift=0",
                           "--binary=false"]) == 0
    with open(f"{d}/nnet.final") as f:
        text = f.read()
    assert "<TimeShift>" in text and "<LstmProjected>" in text
    assert "<NumStream>" not in text

    # forward scoring with log output
    assert nnet_forward.main([
        f"{d}/nnet.final", f"scp:{d}/feats.scp", f"ark:{d}/loglik.ark",
        "--apply-log=true"]) == 0
    scores = dict(SequentialMatrixReader(f"ark:{d}/loglik.ark"))
    feats = dict(SequentialMatrixReader(f"scp:{d}/feats.scp"))
    assert set(scores) == set(feats)
    for k in scores:
        assert scores[k].shape == (feats[k].shape[0], 5)
        # log-posteriors: rows logsumexp to ~0
        lse = np.log(np.exp(scores[k]).sum(-1))
        np.testing.assert_allclose(lse, 0.0, atol=1e-4)


def test_training_improves_frame_accuracy(data_dir, capsys):
    """Several iterations over the synthetic task must beat chance
    accuracy (1/5) clearly — the framework can actually learn."""
    d = str(data_dir)
    nnet_initialize.main([f"{d}/nnet.proto", f"{d}/nnet2.init", "--seed=3"])
    model = f"{d}/nnet2.init"
    for i in range(8):
        out = f"{d}/nnet2.iter{i + 1}"
        assert train_lstm_streams.main([
            f"scp:{d}/feats.scp", f"ark:{d}/post.ark", model, out,
            "--learn-rate=0.02", "--momentum=0.9", "--num-stream=2",
            "--batch-size=5", "--targets-delay=0"]) == 0
        model = out

    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.train import StreamScheduler, TrainOptions, run_epoch
    from kaldi_lstm_tpu.io.kaldi_io import (
        RandomAccessPosteriorReader as PR, SequentialMatrixReader as MR)
    nnet, params = Nnet.read(model)
    sched = StreamScheduler(iter(MR(f"scp:{d}/feats.scp")),
                            PR(f"ark:{d}/post.ark"), feat_dim=6,
                            num_stream=2, batch_size=5, targets_delay=0)
    res = run_epoch(nnet, params, sched, TrainOptions(),
                    crossvalidate=True)
    acc = res.stats.correct / res.stats.frames
    assert acc > 0.5, f"frame accuracy {acc} not better than chance"
