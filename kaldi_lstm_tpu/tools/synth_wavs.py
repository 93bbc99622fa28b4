"""Render transition-id alignments as audio: each pdf gets a fixed
random log-amplitude profile over the mel-bin center frequencies, and
every 10 ms frame is the corresponding mixture of sinusoids. fbank of
the result is then a (leaky) linear mixture of per-pdf log-amplitude
vectors — separable at thousands of senones — so the synthetic corpus
can be driven through the REAL front end (wav -> fbank -> CMVN) instead
of sampling Gaussian features directly, completing the reference's
workflow shape (wav.scp in, train_lstm_streams.sh upstream of
google/run.sh) at flagship dims.

    python -m kaldi_lstm_tpu.tools.synth_wavs <model> <ali-rspecifier> \\
        <wav-dir> [--num-mel-bins 40] [--samp-freq 16000] ...

Writes <wav-dir>/uttN.wav + <wav-dir>/wav.scp. Frame k of the alignment
occupies samples [k*160, (k+1)*160) with the amplitude envelope shifted
so the analysis window CENTER (25 ms window, 10 ms shift) lands on the
frame it is labeled with; num_samples = 160*T + 240 makes fbank produce
exactly T frames (feats/fbank.py num_frames).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import io as _io

from kaldi_lstm_tpu.io.kaldi_io import (
    _open_rspecifier,
    _read_key,
    _read_value_header,
    read_int_vector,
)
from kaldi_lstm_tpu.io.transition_model import TransitionModel
from kaldi_lstm_tpu.io.wav import write_wav
from kaldi_lstm_tpu.utils import LOG


def mel_center_freqs(num_bins: int, samp_freq: float,
                     low_freq: float = 20.0) -> np.ndarray:
    """Triangular-filter center frequencies of feats/fbank.py mel_banks
    (mel(f) = 1127 ln(1 + f/700), linear in mel from low to nyquist)."""
    high = samp_freq / 2.0

    def mel(f):
        return 1127.0 * np.log1p(np.asarray(f) / 700.0)

    delta = (mel(high) - mel(low_freq)) / (num_bins + 1)
    centers_mel = mel(low_freq) + (np.arange(num_bins) + 1) * delta
    return 700.0 * (np.expm1(centers_mel / 1127.0))


def synth_utterance(pdfs: np.ndarray, amps: np.ndarray,
                    carriers_fn, shift: int, win: int,
                    noise_rms: float, rng) -> np.ndarray:
    """[T] pdf ids -> float waveform of 160*T + 240 samples."""
    T = len(pdfs)
    n_samp = shift * T + (win - shift)
    env = amps[pdfs]                                  # [T, B]
    # window CENTER for fbank frame k is at k*shift + win/2; label the
    # envelope so that center sample falls in frame k's segment
    offset = win // 2 - shift // 2
    idx = np.clip((np.arange(n_samp) - offset) // shift, 0, T - 1)
    x = np.einsum("nb,bn->n", env[idx], carriers_fn(n_samp))
    if noise_rms > 0:
        x = x + rng.randn(n_samp) * noise_rms
    return x


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Synthesize wavs from "
                                            "alignments (per-pdf mel "
                                            "sinusoid mixtures)")
    p.add_argument("model_in")
    p.add_argument("ali_rspecifier")
    p.add_argument("wav_dir")
    p.add_argument("--num-mel-bins", type=int, default=40)
    p.add_argument("--samp-freq", type=float, default=16000.0)
    p.add_argument("--log-amp-stddev", type=float, default=1.0,
                   help="stddev of per-(pdf,bin) log amplitudes")
    p.add_argument("--noise-rms", type=float, default=1.0,
                   help="additive white noise (waveform units; carrier "
                        "scale is --scale)")
    p.add_argument("--scale", type=float, default=250.0,
                   help="global waveform scale (int16 range)")
    p.add_argument("--mean-seed", type=int, default=42,
                   help="seed of the per-pdf amplitude table")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    tm = TransitionModel.load(args.model_in)
    os.makedirs(args.wav_dir, exist_ok=True)
    fs = args.samp_freq
    shift, win = int(fs * 0.010), int(fs * 0.025)
    B = args.num_mel_bins
    freqs = mel_center_freqs(B, fs)
    mean_rng = np.random.RandomState(args.mean_seed)
    # fixed per-bin phases + per-(pdf,bin) log-normal amplitudes
    phases = mean_rng.uniform(0, 2 * np.pi, B)
    amps = np.exp(mean_rng.randn(tm.num_pdfs, B)
                  * args.log_amp_stddev).astype(np.float32)
    rng = np.random.RandomState(args.seed)

    # small FIFO cache: utterance lengths interleave, so keep several
    # carrier tables instead of thrashing one slot per length change
    carrier_cache: dict = {}

    def carriers(n_samp):
        if n_samp not in carrier_cache:
            if len(carrier_cache) >= 16:
                carrier_cache.pop(next(iter(carrier_cache)))
            t = np.arange(n_samp) / fs
            carrier_cache[n_samp] = np.sin(
                2 * np.pi * freqs[:, None] * t[None, :]
                + phases[:, None]).astype(np.float32)
        return carrier_cache[n_samp]

    kind, stream = _open_rspecifier(args.ali_rspecifier)
    if kind != "ark":
        print("synth_wavs: only ark: alignment input supported",
              file=sys.stderr)
        return 1
    buffered = stream if isinstance(stream, _io.BufferedReader) \
        else _io.BufferedReader(stream)
    n = 0
    with open(os.path.join(args.wav_dir, "wav.scp"), "w") as scp:
        while True:
            key = _read_key(buffered)
            if key is None:
                break
            tids = read_int_vector(_read_value_header(buffered))
            pdfs = tm.transition_ids_to_pdfs(tids)
            x = synth_utterance(pdfs, amps, carriers, shift, win,
                                args.noise_rms, rng)
            x = np.clip(x * args.scale, -32000, 32000)
            path = os.path.join(args.wav_dir, f"{key}.wav")
            write_wav(path, int(fs), x)
            scp.write(f"{key} {path}\n")
            n += 1
    LOG(f"synthesized {n} wav files ({tm.num_pdfs} pdf profiles, "
        f"{B} mel carriers) in {args.wav_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
