"""Feature extraction: the vectorized fbank/MFCC pipeline is checked
against an INDEPENDENT naive per-frame implementation (explicit python
loop, scipy fft/dct — different code path end to end), plus DSP
property tests (tone -> correct mel bin, frame counts, wav round-trip)
and a CLI smoke test."""

import subprocess
import sys

import numpy as np
import pytest
import scipy.fft

from kaldi_lstm_tpu.feats import (
    FbankOptions,
    FrameOptions,
    MelOptions,
    MfccOptions,
    compute_fbank,
    compute_mfcc,
    mel_banks,
    num_frames,
)
from kaldi_lstm_tpu.io.wav import (
    SequentialWaveReader,
    parse_wav,
    read_wav,
    write_wav,
)

FLT_EPS = float(np.finfo(np.float32).eps)


def _mel(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


def naive_fbank(wave, nbins=23, sf=16000.0, preemph=0.97,
                window="povey", use_energy=False):
    """Deliberately naive reference: per-frame python loop, explicit
    triangle filters evaluated bin by bin, scipy fft."""
    wl, sh, nfft = int(sf * 0.025), int(sf * 0.010), 512
    nf = 1 + (len(wave) - wl) // sh if len(wave) >= wl else 0
    low, high = 20.0, sf / 2
    mlo, mhi = _mel(low), _mel(high)
    d = (mhi - mlo) / (nbins + 1)
    out = []
    for t in range(nf):
        fr = np.array(wave[t * sh: t * sh + wl], np.float64)
        fr = fr - fr.mean()
        log_e = np.log(max(np.dot(fr, fr), FLT_EPS))
        pre = np.empty_like(fr)
        pre[0] = fr[0] - preemph * fr[0]
        for i in range(1, wl):
            pre[i] = fr[i] - preemph * fr[i - 1]
        n = np.arange(wl)
        if window == "povey":
            win = (0.5 - 0.5 * np.cos(2 * np.pi * n / (wl - 1))) ** 0.85
        elif window == "hamming":
            win = 0.54 - 0.46 * np.cos(2 * np.pi * n / (wl - 1))
        else:
            win = np.ones(wl)
        spec = scipy.fft.fft(pre * win, n=nfft)
        power = np.abs(spec[:nfft // 2]) ** 2
        row = []
        for b in range(nbins):
            left, center, right = mlo + b * d, mlo + (b + 1) * d, \
                mlo + (b + 2) * d
            acc = 0.0
            for k in range(nfft // 2):
                m = _mel(k * sf / nfft)
                if left < m < right:
                    w = (m - left) / d if m <= center \
                        else (right - m) / d
                    acc += w * power[k]
            row.append(np.log(max(acc, FLT_EPS)))
        if use_energy:
            row = [log_e] + row
        out.append(row)
    return np.array(out, np.float32) if out else \
        np.zeros((0, nbins + use_energy), np.float32)


def _opts(dither=0.0, nbins=23, window="povey", **kw):
    return FbankOptions(
        frame_opts=FrameOptions(dither=dither, window_type=window),
        mel_opts=MelOptions(num_bins=nbins), **kw)


def test_fbank_matches_naive_reference():
    rng = np.random.RandomState(0)
    wave = (rng.randn(16000) * 1000).astype(np.float64)
    got = compute_fbank(wave, _opts())
    want = naive_fbank(wave)
    assert got.shape == want.shape == (98, 23)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fbank_energy_and_windows():
    rng = np.random.RandomState(1)
    wave = (rng.randn(8000) * 500).astype(np.float64)
    got = compute_fbank(wave, _opts(window="hamming", use_energy=True))
    want = naive_fbank(wave, window="hamming", use_energy=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mfcc_matches_naive_dct():
    rng = np.random.RandomState(2)
    wave = (rng.randn(8000) * 800).astype(np.float64)
    o = MfccOptions(frame_opts=FrameOptions(dither=0.0),
                    mel_opts=MelOptions(num_bins=23))
    got = compute_mfcc(wave, o)
    logmel = naive_fbank(wave)
    # scipy's orthonormal DCT-II == upstream ComputeDctMatrix
    ceps = scipy.fft.dct(logmel, type=2, norm="ortho", axis=1)[:, :13]
    q = 22.0
    ceps = ceps * (1 + 0.5 * q * np.sin(np.pi * np.arange(13) / q))
    # C0 replaced by raw log-energy (use_energy default)
    naive_e = naive_fbank(wave, use_energy=True)[:, 0]
    ceps[:, 0] = naive_e
    np.testing.assert_allclose(got, ceps, rtol=1e-4, atol=1e-4)


def test_tone_lands_in_correct_mel_bin():
    sf, hz = 16000.0, 1000.0
    t = np.arange(32000) / sf
    wave = 10000 * np.sin(2 * np.pi * hz * t)
    feat = compute_fbank(wave, _opts(nbins=40))
    banks = mel_banks(FrameOptions(), MelOptions(num_bins=40))
    freqs = np.arange(256) * (sf / 512)
    # expected: the filter whose response at 1 kHz is maximal
    expect = int(np.argmax(banks[:, np.argmin(np.abs(freqs - hz))]))
    got = int(np.argmax(feat.mean(axis=0)))
    assert abs(got - expect) <= 1


def test_frame_counts_and_short_input():
    fo = FrameOptions()
    assert num_frames(400, fo) == 1
    assert num_frames(399, fo) == 0
    assert num_frames(560, fo) == 2
    assert compute_fbank(np.zeros(100), _opts()).shape == (0, 23)
    # snip_edges=false covers every shift-worth of audio
    fo2 = FrameOptions(snip_edges=False)
    assert num_frames(16000, fo2) == 100
    o = FbankOptions(frame_opts=FrameOptions(dither=0.0,
                                             snip_edges=False))
    assert compute_fbank(np.random.RandomState(3).randn(16000) * 100,
                         o).shape == (100, 23)


def test_dither_reproducible_seeded():
    rng = np.random.RandomState(4)
    wave = rng.randn(4000) * 300
    a = compute_fbank(wave, _opts(dither=1.0),
                      dither_rng=np.random.RandomState(7))
    b = compute_fbank(wave, _opts(dither=1.0),
                      dither_rng=np.random.RandomState(7))
    c = compute_fbank(wave, _opts(dither=1.0),
                      dither_rng=np.random.RandomState(8))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_mel_banks_partition():
    """Interior FFT bins are covered with total weight ~1 where
    adjacent triangles overlap (sum of up+down slopes)."""
    banks = mel_banks(FrameOptions(), MelOptions(num_bins=30))
    total = banks.sum(axis=0)
    freqs = np.arange(256) * (16000.0 / 512)
    # unity holds between the centers of the first and last filters
    # (outside them only one slope covers the bin)
    d = (_mel(8000.0) - _mel(20.0)) / 31
    lo_hz = 700.0 * (np.exp((_mel(20.0) + d) / 1127.0) - 1.0)
    hi_hz = 700.0 * (np.exp((_mel(20.0) + 30 * d) / 1127.0) - 1.0)
    inner = (freqs > lo_hz + 32) & (freqs < hi_hz - 32)
    assert np.all(total[inner] > 0.98) and np.all(total[inner] < 1.02)


def test_wav_roundtrip_and_channels(tmp_path):
    rng = np.random.RandomState(5)
    data = (rng.randn(2, 1600) * 3000).round()
    p = str(tmp_path / "x.wav")
    write_wav(p, 8000, data)
    w = read_wav(p)
    assert w.samp_freq == 8000
    assert w.data.shape == (2, 1600)
    np.testing.assert_array_equal(w.data, data.astype(np.float32))
    assert abs(w.duration - 0.2) < 1e-9


def test_wav_float_and_24bit(tmp_path):
    import struct
    # float32 wav: kaldi scales by 32768
    x = np.array([0.5, -0.25, 1.0], np.float32)
    body = x.tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(body),
                      b"WAVE", b"fmt ", 16, 3, 1, 16000, 64000, 4, 32,
                      b"data", len(body))
    w = parse_wav(hdr + body)
    np.testing.assert_allclose(w.channel(0),
                               [16384.0, -8192.0, 32768.0])
    with pytest.raises(ValueError):
        parse_wav(b"RIFF....JUNK")


def test_cli_fbank_smoke(tmp_path):
    from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader
    rng = np.random.RandomState(6)
    scp = tmp_path / "wav.scp"
    lines = []
    for i in range(3):
        p = tmp_path / f"u{i}.wav"
        write_wav(str(p), 16000, rng.randn(16000 + 300 * i) * 2000)
        lines.append(f"utt{i} {p}\n")
    scp.write_text("".join(lines))
    from kaldi_lstm_tpu.tools.compute_fbank_feats import main
    ark = tmp_path / "f.ark"
    rc = main([f"scp:{scp}", f"ark,scp:{ark},{tmp_path}/f.scp",
               "--num-mel-bins", "40", "--dither", "0.0"])
    assert rc == 0
    got = dict(SequentialMatrixReader(f"scp:{tmp_path}/f.scp"))
    assert sorted(got) == ["utt0", "utt1", "utt2"]
    assert got["utt0"].shape == (98, 40)
    ref = compute_fbank(read_wav(str(tmp_path / "u0.wav")).channel(0),
                        _opts(nbins=40))
    np.testing.assert_allclose(got["utt0"], ref, rtol=1e-5, atol=1e-5)


def test_wave_reader_pipe_command(tmp_path):
    rng = np.random.RandomState(9)
    p = tmp_path / "a.wav"
    write_wav(str(p), 16000, rng.randn(2000) * 100)
    scp = tmp_path / "wav.scp"
    scp.write_text(f"a cat {p} |\nb {p}\n")
    utts = {k: w.data for k, w in SequentialWaveReader(f"scp:{scp}")}
    np.testing.assert_array_equal(utts["a"], utts["b"])


def test_snip_edges_false_left_edge_mirrors_kaldi():
    """Upstream feature-window.cc mirrors around -0.5: sample -1 -> 0,
    -2 -> 1 (NOT -1 -> 1)."""
    from kaldi_lstm_tpu.feats.fbank import _extract_frames
    wave = np.arange(1000, dtype=np.float64)
    fo = FrameOptions(snip_edges=False)
    frames = _extract_frames(wave, fo)
    # frame 0 starts at shift/2 - length/2 = 80 - 200 = -120
    want = np.concatenate([wave[119::-1], wave[:280]])
    np.testing.assert_array_equal(frames[0], want)
    # right edge: last frame mirrors n -> n-1, n+1 -> n-2
    start = (frames.shape[0] - 1) * fo.window_shift \
        + fo.window_shift // 2 - fo.window_size // 2
    idx = np.arange(start, start + fo.window_size)
    idx = np.where(idx < 0, -idx - 1, idx)
    idx = np.where(idx >= 1000, 2 * 1000 - 1 - idx, idx)
    np.testing.assert_array_equal(frames[-1], wave[idx])
