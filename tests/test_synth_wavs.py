"""synth_wavs: alignments render to audio whose fbank features are
frame-aligned and class-separable — the foundation the flagship
end-to-end experiment (examples/flagship_experiment.sh) stands on."""

import sys

import numpy as np

from kaldi_lstm_tpu.feats.fbank import FbankOptions, compute_fbank
from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader
from kaldi_lstm_tpu.io.transition_model import (
    make_monophone_transition_model,
)
from kaldi_lstm_tpu.io.wav import read_wav
from kaldi_lstm_tpu.tools.make_word_synth_data import main as make_corpus
from kaldi_lstm_tpu.tools.synth_wavs import main as synth_main


def _make(tmp_path, num_phones=20, num_utts=8):
    d = tmp_path / "corpus"
    make_corpus(["--dir", str(d), "--num-words", "15",
                 "--num-phones", str(num_phones),
                 "--states-per-phone", "3", "--num-utts", str(num_utts),
                 "--feat-dim", "4", "--self-loop-prob", "0.7",
                 "--seed", "0"])
    assert synth_main([str(d / "final.mdl"), f"ark:{d}/ali.ark",
                       str(tmp_path / "wav")]) == 0
    return d


def test_frame_counts_match_alignment(tmp_path):
    d = _make(tmp_path)
    from kaldi_lstm_tpu.io.kaldi_io import (
        _open_rspecifier,
        _read_key,
        _read_value_header,
        read_int_vector,
    )
    import io as _io
    kind, stream = _open_rspecifier(f"ark:{d}/ali.ark")
    buf = _io.BufferedReader(stream)
    lens = {}
    while True:
        key = _read_key(buf)
        if key is None:
            break
        lens[key] = len(read_int_vector(_read_value_header(buf)))
    opts = FbankOptions()
    n = 0
    with open(tmp_path / "wav" / "wav.scp") as scp:
        for line in scp:
            key, path = line.split()
            wd = read_wav(path)
            assert wd.samp_freq == 16000
            feats = compute_fbank(wd.channel(0), opts)
            # exactly one fbank frame per alignment frame
            assert feats.shape == (lens[key], opts.mel_opts.num_bins)
            n += 1
    assert n == len(lens) == 8


def test_features_separate_pdfs(tmp_path):
    """Nearest-centroid frame classification on the synthesized audio's
    fbank must beat 85% (measured ~97% at 1k pdfs; here 60 pdfs)."""
    d = _make(tmp_path)
    from kaldi_lstm_tpu.tools.ali_to_pdf import main as a2p
    from kaldi_lstm_tpu.tools.compute_fbank_feats import main as fb

    assert fb([f"scp:{tmp_path}/wav/wav.scp",
               f"ark,scp:{tmp_path}/fb.ark,{tmp_path}/fb.scp",
               "--num-mel-bins", "40"]) == 0
    assert a2p([str(d / "final.mdl"), f"ark:{d}/ali.ark",
                f"ark:{tmp_path}/pdf.ark"]) == 0

    from kaldi_lstm_tpu.io.kaldi_io import (
        _open_rspecifier,
        _read_key,
        _read_value_header,
        read_int_vector,
    )
    import io as _io
    feats = dict(SequentialMatrixReader(f"scp:{tmp_path}/fb.scp"))
    kind, stream = _open_rspecifier(f"ark:{tmp_path}/pdf.ark")
    buf = _io.BufferedReader(stream)
    X, Y = [], []
    while True:
        key = _read_key(buf)
        if key is None:
            break
        pdfs = read_int_vector(_read_value_header(buf))
        X.append(feats[key])
        Y.append(pdfs)
    X, Y = np.concatenate(X), np.concatenate(Y)
    K = int(Y.max()) + 1
    idx = np.arange(len(Y))
    tr, te = idx[::2], idx[1::2]
    cent = np.zeros((K, X.shape[1]))
    cnt = np.zeros(K)
    np.add.at(cent, Y[tr], X[tr])
    np.add.at(cnt, Y[tr], 1)
    seen = cnt > 0
    cent[seen] /= cnt[seen][:, None]
    cent[~seen] = 1e9
    d2 = ((X[te] ** 2).sum(1)[:, None] - 2 * X[te] @ cent.T
          + (cent ** 2).sum(1)[None])
    acc = (d2.argmin(1) == Y[te]).mean()
    assert acc > 0.85, f"separability too low: {acc:.3f}"
