"""copy_feats / add_deltas table utilities."""

import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    MatrixWriter,
    SequentialMatrixReader,
)
from kaldi_lstm_tpu.tools.add_deltas import add_deltas, delta_coeffs
from kaldi_lstm_tpu.tools.copy_feats import main as copy_main
from kaldi_lstm_tpu.tools.add_deltas import main as deltas_main


def _write_ark(path, mats):
    with MatrixWriter(f"ark,scp:{path}.ark,{path}.scp") as w:
        for k, m in mats.items():
            w.write(k, m)


def test_copy_feats_roundtrip_and_compress(tmp_path):
    rng = np.random.RandomState(0)
    mats = {f"u{i}": rng.randn(20 + i, 13).astype(np.float32)
            for i in range(4)}
    _write_ark(str(tmp_path / "in"), mats)
    assert copy_main([f"scp:{tmp_path}/in.scp",
                      f"ark,scp:{tmp_path}/o.ark,{tmp_path}/o.scp"]) == 0
    got = dict(SequentialMatrixReader(f"scp:{tmp_path}/o.scp"))
    assert sorted(got) == sorted(mats)
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])
    # compressed copy is lossy but close
    assert copy_main([f"ark:{tmp_path}/o.ark", f"ark:{tmp_path}/c.ark",
                      "--compress=true"]) == 0
    gotc = dict(SequentialMatrixReader(f"ark:{tmp_path}/c.ark"))
    for k in mats:
        np.testing.assert_allclose(gotc[k], mats[k], atol=2e-2)
    # text output readable back
    assert copy_main([f"ark:{tmp_path}/o.ark",
                      f"ark,t:{tmp_path}/t.ark"]) == 0
    gott = dict(SequentialMatrixReader(f"ark:{tmp_path}/t.ark"))
    for k in mats:
        np.testing.assert_allclose(gott[k], mats[k], atol=1e-5)


def test_delta_coeffs_standard_window():
    # order 1, window 2: k/sum(k^2) = [-2,-1,0,1,2]/10
    c = delta_coeffs(1, 2)[1]
    np.testing.assert_allclose(c, np.array([-2, -1, 0, 1, 2]) / 10.0)
    # order 2 = convolution of that with itself
    c2 = delta_coeffs(2, 2)[2]
    np.testing.assert_allclose(c2, np.convolve(c, c))


def test_add_deltas_linear_ramp():
    """On a linear ramp (interior frames), delta-1 = slope and
    delta-2 = 0."""
    T, D = 30, 3
    slope = np.array([1.0, -2.0, 0.5])
    x = np.arange(T)[:, None] * slope[None, :]
    y = add_deltas(x.astype(np.float32), order=2, window=2)
    assert y.shape == (T, 3 * D)
    inner = slice(4, T - 4)
    np.testing.assert_allclose(y[inner, :D], x[inner], atol=1e-5)
    np.testing.assert_allclose(
        y[inner, D:2 * D], np.tile(slope, (T - 8, 1)), atol=1e-5)
    np.testing.assert_allclose(y[inner, 2 * D:], 0.0, atol=1e-5)


def test_add_deltas_cli(tmp_path):
    rng = np.random.RandomState(1)
    mats = {"a": rng.randn(12, 4).astype(np.float32)}
    _write_ark(str(tmp_path / "in"), mats)
    assert deltas_main([f"ark:{tmp_path}/in.ark",
                        f"ark:{tmp_path}/dd.ark"]) == 0
    got = dict(SequentialMatrixReader(f"ark:{tmp_path}/dd.ark"))
    np.testing.assert_allclose(got["a"], add_deltas(mats["a"]),
                               atol=1e-6)
