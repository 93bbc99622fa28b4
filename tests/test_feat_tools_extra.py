"""feat-to-len / feat-to-dim / paste-feats / splice-feats / select-feats
/ subset-feats table utilities + RandomAccessMatrixReader."""

import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    Int32Writer,
    MatrixWriter,
    RandomAccessMatrixReader,
    SequentialInt32Reader,
    SequentialMatrixReader,
)
from kaldi_lstm_tpu.tools.feat_to_dim import main as dim_main
from kaldi_lstm_tpu.tools.feat_to_len import main as len_main
from kaldi_lstm_tpu.tools.paste_feats import main as paste_main
from kaldi_lstm_tpu.tools.select_feats import main as select_main
from kaldi_lstm_tpu.tools.select_feats import parse_selection
from kaldi_lstm_tpu.tools.splice_feats import main as splice_main
from kaldi_lstm_tpu.tools.splice_feats import splice_frames
from kaldi_lstm_tpu.tools.subset_feats import main as subset_main


def _write_ark(path, mats, scp=True):
    spec = f"ark,scp:{path}.ark,{path}.scp" if scp else f"ark:{path}.ark"
    with MatrixWriter(spec) as w:
        for k, m in mats.items():
            w.write(k, m)


def _mats(n=4, dim=7, seed=0):
    rng = np.random.RandomState(seed)
    return {f"u{i}": rng.randn(10 + 3 * i, dim).astype(np.float32)
            for i in range(n)}


def test_random_access_matrix_reader_ark_and_scp(tmp_path):
    mats = _mats()
    _write_ark(str(tmp_path / "in"), mats)
    for spec in (f"ark:{tmp_path}/in.ark", f"scp:{tmp_path}/in.scp"):
        r = RandomAccessMatrixReader(spec)
        assert r.has_key("u2") and not r.has_key("nope")
        for k in ("u3", "u0", "u2"):  # out of file order
            np.testing.assert_array_equal(np.asarray(r.value(k)), mats[k])


def test_int32_table_roundtrip(tmp_path):
    vals = {"a": 7, "b": 123456, "c": 0}
    with Int32Writer(f"ark:{tmp_path}/l.ark") as w:
        for k, v in vals.items():
            w.write(k, v)
    assert dict(SequentialInt32Reader(f"ark:{tmp_path}/l.ark")) == vals
    with Int32Writer(f"ark,t:{tmp_path}/lt.ark") as w:
        for k, v in vals.items():
            w.write(k, v)
    assert dict(SequentialInt32Reader(f"ark:{tmp_path}/lt.ark")) == vals
    lines = (tmp_path / "lt.ark").read_text().strip().splitlines()
    assert lines[0].split() == ["a", "7"]


def test_feat_to_len_and_dim(tmp_path, capsys):
    mats = _mats()
    _write_ark(str(tmp_path / "in"), mats)
    assert len_main([f"scp:{tmp_path}/in.scp",
                     f"ark,t:{tmp_path}/len.txt"]) == 0
    got = dict(SequentialInt32Reader(f"ark:{tmp_path}/len.txt"))
    assert got == {k: m.shape[0] for k, m in mats.items()}
    assert dim_main([f"ark:{tmp_path}/in.ark"]) == 0
    assert capsys.readouterr().out.strip() == "7"
    assert dim_main([f"ark:{tmp_path}/in.ark",
                     f"ark,t:{tmp_path}/dim.txt"]) == 0
    got = dict(SequentialInt32Reader(f"ark:{tmp_path}/dim.txt"))
    assert set(got.values()) == {7}


def test_paste_feats(tmp_path):
    a = _mats(dim=5, seed=1)
    b = {k: m[:, :3] * 2 for k, m in a.items()}
    # perturb lengths: one within tolerance, one beyond
    b["u1"] = b["u1"][:-1]
    b["u2"] = b["u2"][:-5]
    del b["u3"]  # missing key
    _write_ark(str(tmp_path / "a"), a)
    _write_ark(str(tmp_path / "b"), b)
    assert paste_main([f"scp:{tmp_path}/a.scp", f"ark:{tmp_path}/b.ark",
                       f"ark:{tmp_path}/o.ark",
                       "--length-tolerance", "1"]) == 0
    got = dict(SequentialMatrixReader(f"ark:{tmp_path}/o.ark"))
    assert sorted(got) == ["u0", "u1"]  # u2 tolerance, u3 missing
    t = b["u1"].shape[0]
    np.testing.assert_array_equal(
        got["u1"], np.concatenate([a["u1"][:t], b["u1"]], axis=1))
    assert got["u0"].shape == (a["u0"].shape[0], 8)


def test_splice_frames_matches_component_semantics():
    x = np.arange(12, dtype=np.float32).reshape(6, 2)
    y = splice_frames(x, 1, 2)
    assert y.shape == (6, 8)
    # interior frame: plain window
    np.testing.assert_array_equal(y[2], np.concatenate(
        [x[1], x[2], x[3], x[4]]))
    # edges clamp
    np.testing.assert_array_equal(y[0], np.concatenate(
        [x[0], x[0], x[1], x[2]]))
    np.testing.assert_array_equal(y[5], np.concatenate(
        [x[4], x[5], x[5], x[5]]))


def test_splice_feats_cli(tmp_path):
    mats = _mats(n=2)
    _write_ark(str(tmp_path / "in"), mats)
    assert splice_main([f"ark:{tmp_path}/in.ark", f"ark:{tmp_path}/s.ark",
                        "--left-context", "2", "--right-context", "2"]) == 0
    got = dict(SequentialMatrixReader(f"ark:{tmp_path}/s.ark"))
    for k, m in mats.items():
        np.testing.assert_array_equal(got[k], splice_frames(m, 2, 2))


def test_parse_selection():
    assert parse_selection("1,3-5,24-22,0") == [1, 3, 4, 5, 24, 23, 22, 0]
    assert parse_selection("2") == [2]


def test_select_feats_cli(tmp_path):
    mats = _mats(n=2)
    _write_ark(str(tmp_path / "in"), mats)
    assert select_main(["4-2,0", f"ark:{tmp_path}/in.ark",
                        f"ark:{tmp_path}/o.ark"]) == 0
    got = dict(SequentialMatrixReader(f"ark:{tmp_path}/o.ark"))
    for k, m in mats.items():
        np.testing.assert_array_equal(got[k], m[:, [4, 3, 2, 0]])
    # out-of-range column fails
    assert select_main(["9", f"ark:{tmp_path}/in.ark",
                        f"ark:{tmp_path}/bad.ark"]) == 1


def test_subset_feats(tmp_path):
    mats = _mats(n=5)
    _write_ark(str(tmp_path / "in"), mats)
    assert subset_main([f"ark:{tmp_path}/in.ark", f"ark:{tmp_path}/n.ark",
                        "--n", "2"]) == 0
    assert sorted(dict(SequentialMatrixReader(
        f"ark:{tmp_path}/n.ark"))) == ["u0", "u1"]
    (tmp_path / "keys").write_text("u3\nu1\n")
    assert subset_main([f"ark:{tmp_path}/in.ark", f"ark:{tmp_path}/i.ark",
                        "--include", str(tmp_path / "keys")]) == 0
    assert sorted(dict(SequentialMatrixReader(
        f"ark:{tmp_path}/i.ark"))) == ["u1", "u3"]
    assert subset_main([f"ark:{tmp_path}/in.ark", f"ark:{tmp_path}/e.ark",
                        "--exclude", str(tmp_path / "keys")]) == 0
    assert sorted(dict(SequentialMatrixReader(
        f"ark:{tmp_path}/e.ark"))) == ["u0", "u2", "u4"]


def test_feat_to_dim_wxfilename(tmp_path):
    """Upstream <dim-wxfilename> form: dim written to a plain file."""
    mats = _mats(n=1)
    _write_ark(str(tmp_path / "in"), mats)
    out = tmp_path / "dim"
    assert dim_main([f"ark:{tmp_path}/in.ark", str(out)]) == 0
    assert out.read_text().strip() == "7"


def test_subset_feats_n_zero(tmp_path):
    mats = _mats(n=3)
    _write_ark(str(tmp_path / "in"), mats)
    assert subset_main([f"ark:{tmp_path}/in.ark",
                        f"ark:{tmp_path}/z.ark", "--n", "0"]) == 1
    assert dict(SequentialMatrixReader(f"ark:{tmp_path}/z.ark")) == {}
