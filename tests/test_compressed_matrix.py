"""Kaldi CompressedMatrix wire format (upstream
matrix/compressed-matrix.{h,cc}): real feature arks are usually written
--compress=true, so the readers must accept CM/CM2/CM3 records."""

import io

import numpy as np
import pytest

from kaldi_lstm_tpu.io.kaldi_io import (
    CompressedMatrixWriter,
    KaldiInput,
    KaldiOutput,
    SequentialMatrixReader,
    read_matrix,
    write_compressed_matrix,
)


def roundtrip(mat, method):
    buf = io.BytesIO()
    out = KaldiOutput(buf, binary=True)
    write_compressed_matrix(out, mat, method)
    buf.seek(0)
    return read_matrix(KaldiInput(io.BufferedReader(buf)))


@pytest.mark.parametrize("method,tol_frac", [
    ("CM", 1 / 48.0),   # 3-segment uint8: fine near the quartiles,
                        # coarser in the tails — bound by segment width
    ("CM2", 1 / 30000.0),
    ("CM3", 1 / 200.0),
])
def test_roundtrip_accuracy(method, tol_frac):
    rng = np.random.RandomState(0)
    mat = rng.randn(50, 13).astype(np.float32) * 3.0 + 1.0
    got = roundtrip(mat, method)
    assert got.shape == mat.shape
    rngv = mat.max() - mat.min()
    assert np.max(np.abs(got - mat)) <= rngv * tol_frac


def test_cm_column_major_layout():
    """Column identity must survive (CM data is column-major; a layout
    bug would smear columns together)."""
    mat = np.zeros((20, 3), np.float32)
    mat[:, 0] = np.linspace(0, 1, 20)
    mat[:, 1] = np.linspace(10, 11, 20)
    mat[:, 2] = np.linspace(-5, -4, 20)
    got = roundtrip(mat, "CM")
    for c in range(3):
        assert abs(got[:, c].mean() - mat[:, c].mean()) < 0.1


def test_constant_and_tiny_matrices():
    for method in ("CM", "CM2", "CM3"):
        got = roundtrip(np.full((9, 4), 2.5, np.float32), method)
        np.testing.assert_allclose(got, 2.5, atol=1e-3)
    # fewer rows than the percentile spread needs
    got = roundtrip(np.array([[1.0, 2.0]], np.float32), "CM")
    np.testing.assert_allclose(got, [[1.0, 2.0]], atol=0.05)


def test_compressed_ark_via_readers(tmp_path):
    """Compressed ark + scp roundtrip through the standard readers (the
    mmap fast path must fall back for non-FM records)."""
    d = str(tmp_path)
    rng = np.random.RandomState(1)
    mats = {f"u{i}": rng.randn(30 + i, 8).astype(np.float32)
            for i in range(4)}
    with CompressedMatrixWriter(f"ark,scp:{d}/c.ark,{d}/c.scp") as w:
        for k, m in sorted(mats.items()):
            w.write(k, m)
    for spec in (f"ark:{d}/c.ark", f"scp:{d}/c.scp"):
        got = dict(SequentialMatrixReader(spec))
        assert set(got) == set(mats)
        for k in mats:
            rngv = mats[k].max() - mats[k].min()
            assert np.max(np.abs(got[k] - mats[k])) <= rngv / 48.0, spec


def test_compression_ratio(tmp_path):
    import os
    d = str(tmp_path)
    m = np.random.RandomState(2).randn(1000, 40).astype(np.float32)
    from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter
    with MatrixWriter(f"ark:{d}/f.ark") as w:
        w.write("u", m)
    with CompressedMatrixWriter(f"ark:{d}/c.ark") as w:
        w.write("u", m)
    assert os.path.getsize(f"{d}/c.ark") < os.path.getsize(
        f"{d}/f.ark") / 3.5
