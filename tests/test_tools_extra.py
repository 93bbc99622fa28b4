"""Smoke tests for the remaining CLI tools: nnet_concat, make_synth_data."""

import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    RandomAccessPosteriorReader,
    SequentialMatrixReader,
)
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.tools import make_synth_data, nnet_concat, \
    nnet_initialize


def test_nnet_concat(tmp_path):
    d = str(tmp_path)
    (tmp_path / "a.proto").write_text(
        "<NnetProto>\n<AddShift> <InputDim> 5 <OutputDim> 5\n"
        "<Rescale> <InputDim> 5 <OutputDim> 5\n</NnetProto>")
    (tmp_path / "b.proto").write_text(
        "<NnetProto>\n<AffineTransform> <InputDim> 5 <OutputDim> 3\n"
        "<Softmax> <InputDim> 3 <OutputDim> 3\n</NnetProto>")
    assert nnet_initialize.main([f"{d}/a.proto", f"{d}/a.nnet"]) == 0
    assert nnet_initialize.main([f"{d}/b.proto", f"{d}/b.nnet"]) == 0
    assert nnet_concat.main([f"{d}/a.nnet", f"{d}/b.nnet",
                             f"{d}/ab.nnet"]) == 0
    nnet, params = Nnet.read(f"{d}/ab.nnet")
    assert len(nnet) == 4
    assert nnet.input_dim == 5 and nnet.output_dim == 3

    # dim mismatch rejected
    assert nnet_concat.main([f"{d}/b.nnet", f"{d}/a.nnet",
                             f"{d}/bad.nnet"]) == 1


def test_make_synth_data(tmp_path):
    d = str(tmp_path / "corpus")
    assert make_synth_data.main([
        "--dir", d, "--num-utts", "5", "--feat-dim", "7",
        "--num-classes", "11", "--min-len", "10", "--max-len", "20"]) == 0
    feats = dict(SequentialMatrixReader(f"scp:{d}/feats.scp"))
    assert len(feats) == 5
    posts = RandomAccessPosteriorReader(f"ark:{d}/post.ark")
    for k, f in feats.items():
        assert 10 <= f.shape[0] <= 20 and f.shape[1] == 7
        ids, w = posts.value_dense(k, 1)
        assert ids.shape[0] == f.shape[0]
        assert ids.max() < 11 and w.max() == 1.0

    # same label map across different data seeds (generalization contract)
    d2 = str(tmp_path / "corpus2")
    assert make_synth_data.main([
        "--dir", d2, "--num-utts", "3", "--feat-dim", "7",
        "--num-classes", "11", "--seed", "9"]) == 0
    f2 = dict(SequentialMatrixReader(f"scp:{d2}/feats.scp"))
    assert not np.array_equal(list(feats.values())[0][:5],
                              list(f2.values())[0][:5])
