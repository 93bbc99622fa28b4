"""extract-segments / wav tables (ark) / wav-to-duration."""

import io

import numpy as np
import pytest

from kaldi_lstm_tpu.io.wav import (
    SequentialWaveReader,
    WaveWriter,
    read_wav_record,
    wav_bytes,
    write_wav,
)
from kaldi_lstm_tpu.tools.extract_segments import main as extract_main
from kaldi_lstm_tpu.tools.extract_segments import read_segments
from kaldi_lstm_tpu.tools.wav_to_duration import main as dur_main


def _make_wav_scp(tmp_path, recs):
    scp = tmp_path / "wav.scp"
    with open(scp, "w") as f:
        for key, (freq, data) in recs.items():
            path = tmp_path / f"{key}.wav"
            write_wav(path, freq, data)
            f.write(f"{key} {path}\n")
    return scp


def test_wav_ark_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    recs = {f"r{i}": rng.randint(-3000, 3000,
                                 (1, 800 + i * 50)).astype(np.float32)
            for i in range(3)}
    with WaveWriter(f"ark,scp:{tmp_path}/w.ark,{tmp_path}/w.scp") as w:
        for k, x in recs.items():
            w.write(k, 8000.0, x)
    # sequential over the ark
    got = {k: wv for k, wv in SequentialWaveReader(f"ark:{tmp_path}/w.ark")}
    assert sorted(got) == sorted(recs)
    for k in recs:
        assert got[k].samp_freq == 8000.0
        np.testing.assert_array_equal(got[k].data, recs[k])
    # scp offsets into the ark
    got2 = {k: wv for k, wv in
            SequentialWaveReader(f"scp:{tmp_path}/w.scp")}
    for k in recs:
        np.testing.assert_array_equal(got2[k].data, recs[k])


def test_read_wav_record_stops_at_boundary():
    a = wav_bytes(16000.0, np.zeros(100, np.float32))
    b = wav_bytes(16000.0, np.ones(50, np.float32) * 100)
    stream = io.BytesIO(a + b)
    w1 = read_wav_record(stream)
    w2 = read_wav_record(stream)
    assert w1.data.shape[1] == 100 and w2.data.shape[1] == 50
    with pytest.raises(EOFError):
        read_wav_record(stream)


def test_read_segments_validation(tmp_path):
    f = tmp_path / "segments"
    f.write_text("s1 rec1 0.0 1.0\ns2 rec1 1.0 2.5 1\n")
    segs = read_segments(str(f))
    assert segs[0] == ("s1", "rec1", 0.0, 1.0, -1)
    assert segs[1] == ("s2", "rec1", 1.0, 2.5, 1)
    f.write_text("bad rec1 2.0 1.0\n")
    with pytest.raises(ValueError):
        read_segments(str(f))


def test_extract_segments_e2e(tmp_path):
    freq = 1000.0
    ramp = np.arange(5000, dtype=np.float32)[None, :] % 3000 - 1500
    stereo = np.stack([np.full(4000, 100.0, np.float32),
                       np.full(4000, -200.0, np.float32)])
    scp = _make_wav_scp(tmp_path, {"rec1": (freq, ramp),
                                   "rec2": (freq, stereo)})
    seg = tmp_path / "segments"
    seg.write_text(
        "u1 rec1 0.5 1.5\n"        # plain cut
        "u2 rec1 4.0 5.3\n"        # overshoots 0.3 s -> clipped
        "u3 rec1 4.0 9.0\n"        # overshoots 4 s -> skipped
        "u4 rec1 1.0 1.05\n"       # too short
        "u5 rec2 0.0 2.0 1\n"      # channel 1
        "u6 rec3 0.0 1.0\n"        # unknown recording -> ignored
        "u7 rec1 3.0 0\n"          # end<=0: to end of file
    )
    assert extract_main([f"scp:{scp}", str(seg),
                         f"ark:{tmp_path}/segs.ark"]) == 0
    got = dict(SequentialWaveReader(f"ark:{tmp_path}/segs.ark"))
    assert sorted(got) == ["u1", "u2", "u5", "u7"]
    np.testing.assert_array_equal(got["u1"].data[0], ramp[0, 500:1500])
    np.testing.assert_array_equal(got["u2"].data[0], ramp[0, 4000:5000])
    np.testing.assert_array_equal(got["u5"].data[0], stereo[1, 0:2000])
    np.testing.assert_array_equal(got["u7"].data[0], ramp[0, 3000:])


def test_wav_to_duration(tmp_path, capsys):
    scp = _make_wav_scp(tmp_path, {
        "a": (8000.0, np.zeros(8000, np.float32)),
        "b": (16000.0, np.zeros(24000, np.float32))})
    assert dur_main([f"scp:{scp}", f"ark,t:{tmp_path}/dur.txt"]) == 0
    lines = dict(line.split() for line in
                 (tmp_path / "dur.txt").read_text().splitlines())
    assert float(lines["a"]) == pytest.approx(1.0)
    assert float(lines["b"]) == pytest.approx(1.5)
