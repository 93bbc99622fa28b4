"""Full decode-side pipeline: ali_to_post -> counts -> forward with prior
division -> scaled log-likelihoods (SURVEY.md §3.2)."""

import io

import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    KaldiInput,
    KaldiOutput,
    MatrixWriter,
    SequentialMatrixReader,
    TableWriter,
    read_vector,
    write_int_vector,
)
from kaldi_lstm_tpu.tools import (
    ali_to_post,
    compute_class_counts,
    nnet_forward,
    nnet_initialize,
)

PROTO = """<NnetProto>
<TimeShift> <InputDim> 5 <OutputDim> 5 <Shift> 2
<LstmProjected> <InputDim> 5 <OutputDim> 6 <CellDim> 8 <ParamScale> 0.05
<AffineTransform> <InputDim> 6 <OutputDim> 7 <ParamStddev> 0.1
<Softmax> <InputDim> 7 <OutputDim> 7
</NnetProto>
"""


def test_decode_pipeline(tmp_path):
    d = str(tmp_path)
    rng = np.random.RandomState(0)

    # alignments + features
    with TableWriter(f"ark:{d}/ali.ark", write_int_vector) as aw, \
            MatrixWriter(f"ark:{d}/feats.ark") as fw:
        for i in range(4):
            L = rng.randint(8, 20)
            aw.write(f"u{i}", rng.randint(0, 7, L))
            fw.write(f"u{i}", rng.randn(L, 5).astype(np.float32))

    assert ali_to_post.main([f"ark:{d}/ali.ark", f"ark:{d}/post.ark"]) == 0
    assert compute_class_counts.main(
        [f"ark:{d}/post.ark", f"{d}/counts.vec", "--num-classes=7"]) == 0

    with open(f"{d}/counts.vec", "rb") as f:
        counts = read_vector(KaldiInput(io.BufferedReader(
            io.FileIO(f.fileno(), closefd=False))))
    assert counts.shape == (7,)
    assert counts.sum() > 0

    proto = tmp_path / "p.proto"
    proto.write_text(PROTO)
    assert nnet_initialize.main([str(proto), f"{d}/nnet.final"]) == 0
    assert nnet_forward.main([
        f"{d}/nnet.final", f"ark:{d}/feats.ark", f"ark:{d}/loglik.ark",
        "--apply-log=true", f"--class-frame-counts={d}/counts.vec",
        "--batch-utts=3", "--length-bucket=16"]) == 0

    feats = dict(SequentialMatrixReader(f"ark:{d}/feats.ark"))
    out = dict(SequentialMatrixReader(f"ark:{d}/loglik.ark"))
    assert set(out) == set(feats)
    priors = counts / counts.sum()
    for k in out:
        assert out[k].shape == (feats[k].shape[0], 7)
        # undoing the prior division recovers log-posteriors (logsumexp 0)
        logpost = out[k] + np.log(np.maximum(priors, 1e-10))
        lse = np.log(np.exp(logpost).sum(-1))
        np.testing.assert_allclose(lse, 0.0, atol=1e-4)
