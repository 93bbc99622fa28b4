"""scale-post / sum-post / analyze-counts."""

import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    KaldiInput,
    PosteriorWriter,
    SequentialPosteriorReader,
    TableWriter,
    read_vector,
    write_int_vector,
    write_vector,
)
from kaldi_lstm_tpu.tools.analyze_counts import main as counts_main
from kaldi_lstm_tpu.tools.scale_post import main as scale_main
from kaldi_lstm_tpu.tools.sum_post import main as sum_main


def _write_post(path, table):
    with PosteriorWriter(f"ark:{path}") as w:
        for k, post in table.items():
            w.write(k, post)


def test_scale_post_global(tmp_path):
    post = {"u0": [[(1, 1.0)], [(2, 0.5), (3, 0.5)]],
            "u1": [[(0, 1.0)]]}
    _write_post(tmp_path / "p.ark", post)
    assert scale_main([f"ark:{tmp_path}/p.ark", "0.25",
                       f"ark:{tmp_path}/o.ark"]) == 0
    got = dict(SequentialPosteriorReader(f"ark:{tmp_path}/o.ark"))
    assert got["u0"][1] == [(2, 0.125), (3, 0.125)]
    assert got["u1"][0] == [(0, 0.25)]


def test_scale_post_per_frame_table(tmp_path):
    post = {"u0": [[(1, 1.0)], [(2, 2.0)]]}
    _write_post(tmp_path / "p.ark", post)
    with TableWriter(f"ark:{tmp_path}/s.ark", write_vector) as w:
        w.write("u0", np.array([0.5, 0.0], np.float32))
    assert scale_main([f"ark:{tmp_path}/p.ark", f"ark:{tmp_path}/s.ark",
                       f"ark:{tmp_path}/o.ark"]) == 0
    got = dict(SequentialPosteriorReader(f"ark:{tmp_path}/o.ark"))
    assert got["u0"] == [[(1, 0.5)], [(2, 0.0)]]


def test_sum_post_merge_and_scales(tmp_path):
    a = {"u0": [[(1, 1.0)], [(2, 1.0)]]}
    b = {"u0": [[(1, 1.0)], [(3, 1.0)]]}
    _write_post(tmp_path / "a.ark", a)
    _write_post(tmp_path / "b.ark", b)
    assert sum_main(["--scale1", "0.75", "--scale2", "0.25",
                     f"ark:{tmp_path}/a.ark", f"ark:{tmp_path}/b.ark",
                     f"ark:{tmp_path}/o.ark"]) == 0
    got = dict(SequentialPosteriorReader(f"ark:{tmp_path}/o.ark"))
    # frame 0: id 1 appears in both -> merged weight 1.0
    assert got["u0"][0] == [(1, 1.0)]
    assert sorted(got["u0"][1]) == [(2, 0.75), (3, 0.25)]
    # zero-if-disjoint empties frame 1 (no common pdf)
    assert sum_main(["--zero-if-disjoint=true",
                     f"ark:{tmp_path}/a.ark", f"ark:{tmp_path}/b.ark",
                     f"ark:{tmp_path}/z.ark"]) == 0
    got = dict(SequentialPosteriorReader(f"ark:{tmp_path}/z.ark"))
    assert got["u0"][1] == []
    assert got["u0"][0] == [(1, 2.0)]


def test_analyze_counts(tmp_path):
    with TableWriter(f"ark:{tmp_path}/ali.ark", write_int_vector) as w:
        w.write("u0", [0, 1, 1, 3])
        w.write("u1", [3, 3])
    assert counts_main([f"ark:{tmp_path}/ali.ark",
                        f"{tmp_path}/counts",
                        "--counts-padding", "0.5"]) == 0
    with open(tmp_path / "counts", "rb") as f:
        v = read_vector(KaldiInput(f, binary=False))
    np.testing.assert_allclose(v, [1.5, 2.5, 0.5, 3.5])
    # fixed --num-classes errors on out-of-range ids
    assert counts_main([f"ark:{tmp_path}/ali.ark",
                        f"{tmp_path}/c2", "--num-classes", "3"]) == 1


def test_scale_post_scalar_table(tmp_path):
    """Upstream scale-post form: per-utterance scalar BaseFloat table."""
    from kaldi_lstm_tpu.io.kaldi_io import write_float
    post = {"u0": [[(1, 1.0)], [(2, 2.0)]], "u1": [[(0, 4.0)]]}
    _write_post(tmp_path / "p.ark", post)
    with TableWriter(f"ark:{tmp_path}/s.ark", write_float) as w:
        w.write("u0", 0.5)
        w.write("u1", 0.25)
    assert scale_main([f"ark:{tmp_path}/p.ark", f"ark:{tmp_path}/s.ark",
                       f"ark:{tmp_path}/o.ark"]) == 0
    got = dict(SequentialPosteriorReader(f"ark:{tmp_path}/o.ark"))
    assert got["u0"] == [[(1, 0.5)], [(2, 1.0)]]
    assert got["u1"] == [[(0, 1.0)]]


def test_sum_post_keeps_all_entries_of_second_table(tmp_path):
    """The second table must not be truncated to one entry per frame."""
    a = {"u0": [[(1, 1.0)]]}
    b = {"u0": [[(1, 0.6), (2, 0.4)]]}
    _write_post(tmp_path / "a.ark", a)
    _write_post(tmp_path / "b.ark", b)
    assert sum_main([f"ark:{tmp_path}/a.ark", f"ark:{tmp_path}/b.ark",
                     f"ark:{tmp_path}/o.ark"]) == 0
    got = sorted(dict(SequentialPosteriorReader(
        f"ark:{tmp_path}/o.ark"))["u0"][0])
    assert [i for i, _ in got] == [1, 2]
    np.testing.assert_allclose([w for _, w in got], [1.6, 0.4], rtol=1e-6)


def test_analyze_counts_rejects_negative_ids(tmp_path):
    with TableWriter(f"ark:{tmp_path}/bad.ark", write_int_vector) as w:
        w.write("u0", [0, -1, 2])
    assert counts_main([f"ark:{tmp_path}/bad.ark",
                        f"{tmp_path}/c"]) == 1


def test_sequential_int_vector_reader_roundtrip(tmp_path):
    """SequentialIntVectorReader streams a multi-record alignment ark
    written by write_int_vector (the table the ali-to-* tools emit)."""
    import numpy as np

    from kaldi_lstm_tpu.io.kaldi_io import (
        SequentialIntVectorReader,
        TableWriter,
        write_int_vector,
    )
    p = tmp_path / "ali.ark"
    rng = np.random.RandomState(3)
    ref = {f"utt{i}": rng.randint(0, 1000, rng.randint(1, 40))
           for i in range(17)}
    with TableWriter(f"ark:{p}", write_int_vector) as w:
        for k, v in ref.items():
            w.write(k, v)
    got = dict(SequentialIntVectorReader(f"ark:{p}"))
    assert list(got) == list(ref)
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k])


def test_misaligned_table_raises_clear_error(tmp_path):
    """Reading a vector table with the scalar-int32 reader (or any
    reader/table mismatch) must raise a ValueError naming the problem,
    not a bare UnicodeDecodeError from key parsing."""
    import numpy as np
    import pytest

    from kaldi_lstm_tpu.io.kaldi_io import (
        SequentialInt32Reader,
        TableWriter,
        write_int_vector,
    )
    p = tmp_path / "vec.ark"
    with TableWriter(f"ark:{p}", write_int_vector) as w:
        for i in range(4):
            w.write(f"utt{i}", np.arange(30) * 7)
    with pytest.raises(ValueError, match="misaligned|not a Kaldi"):
        list(SequentialInt32Reader(f"ark:{p}"))
