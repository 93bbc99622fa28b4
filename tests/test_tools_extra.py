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


def test_nnet_copy_remove_components(tmp_path):
    """upstream nnet-copy --remove-first-components/--remove-last-components."""
    import jax
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.nnet_copy import main as copy_main
    proto = """<NnetProto>
<AddShift> <InputDim> 6 <OutputDim> 6
<AffineTransform> <InputDim> 6 <OutputDim> 9 <ParamStddev> 0.1
<Sigmoid> <InputDim> 9 <OutputDim> 9
<AffineTransform> <InputDim> 9 <OutputDim> 4 <ParamStddev> 0.1
<Softmax> <InputDim> 4 <OutputDim> 4
</NnetProto>
"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    src = str(tmp_path / "full.nnet")
    nnet.write(src, params)
    out = str(tmp_path / "bn.nnet")
    # strip the feature shift and the senone classifier -> bottleneck net
    assert copy_main([src, out, "--remove-first-components=1",
                      "--remove-last-components=2"]) == 0
    bn, bn_params = Nnet.read(out)
    assert [c.token for c in bn.components] == \
        ["<AffineTransform>", "<Sigmoid>"]
    assert bn.input_dim == 6 and bn.output_dim == 9
    import numpy as np
    np.testing.assert_array_equal(np.asarray(bn_params[0]["linearity"]),
                                  np.asarray(params[1]["linearity"]))
    # removing everything is an error
    assert copy_main([src, out, "--remove-first-components=5"]) == 1


def test_nnet_copy_to_streams_roundtrip(tmp_path):
    """--to-standard then --to-streams restores the google topology with
    identical parameters."""
    import jax
    import numpy as np
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.nnet_copy import main as copy_main
    proto = """<NnetProto>
<Transmit> <InputDim> 6 <OutputDim> 6
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 8 <CellDim> 10 <ParamScale> 0.05 <NumStream> 4
<AffineTransform> <InputDim> 8 <OutputDim> 5 <ParamStddev> 0.1
<Softmax> <InputDim> 5 <OutputDim> 5
</NnetProto>
"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    g0 = str(tmp_path / "g0.nnet")
    nnet.write(g0, params)
    std = str(tmp_path / "std.nnet")
    assert copy_main([g0, std, "--to-standard", "--time-shift", "3"]) == 0
    g1 = str(tmp_path / "g1.nnet")
    assert copy_main([std, g1, "--to-streams"]) == 0
    n1, p1 = Nnet.read(g1)
    assert [c.token for c in n1.components] == [
        "<Transmit>", "<LstmProjectedStreams>", "<AffineTransform>",
        "<Softmax>"]
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # exclusive flags
    assert copy_main([g0, std, "--to-standard", "--to-streams"]) == 1


def test_copy_int_vector_roundtrip(tmp_path):
    import numpy as np
    from kaldi_lstm_tpu.io.kaldi_io import (TableWriter, write_int_vector,
                                            _open_rspecifier, _read_key,
                                            _read_value_header,
                                            read_int_vector)
    from kaldi_lstm_tpu.tools.copy_int_vector import main as civ
    import io as _io
    table = {"a": [1, 2, 3], "b": [9], "c": []}
    with TableWriter(f"ark:{tmp_path}/i.ark", write_int_vector) as w:
        for k, v in table.items():
            w.write(k, v)
    # binary -> text -> binary
    assert civ([f"ark:{tmp_path}/i.ark", f"ark,t:{tmp_path}/t.ark"]) == 0
    assert "a 1 2 3" in (tmp_path / "t.ark").read_text()
    assert civ([f"ark:{tmp_path}/t.ark", f"ark:{tmp_path}/b.ark"]) == 0
    _, s = _open_rspecifier(f"ark:{tmp_path}/b.ark")
    b = _io.BufferedReader(s)
    got = {}
    while True:
        k = _read_key(b)
        if k is None:
            break
        got[k] = list(read_int_vector(_read_value_header(b)))
    assert got == {k: list(v) for k, v in table.items()}
