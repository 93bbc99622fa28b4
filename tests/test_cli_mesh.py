"""The product CLI drives the sharded (mesh) training path.

VERDICT r2 item 1: `--mesh data=D,model=M` on train_lstm_streams must
train a model bit-comparably to the single-device path, through the same
epoch loop (SyncedScheduler, shard_batch_to_mesh, sharded steps), and the
grouped (--step-group) sharded step must match the ungrouped one.
"""

import os

import numpy as np
import pytest

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.tools import (
    make_synth_data,
    nnet_initialize,
    train_lstm_streams,
)

PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 12 <CellDim> 16 <ParamScale> 0.05 <NumStream> 8
<AffineTransform> <InputDim> 12 <OutputDim> 8 <ParamStddev> 0.1
<Softmax> <InputDim> 8 <OutputDim> 8
</NnetProto>
"""


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    make_synth_data.main(["--dir", str(d), "--num-utts", "14",
                          "--feat-dim", "6", "--num-classes", "8",
                          "--seed", "3", "--label-seed", "7",
                          "--max-len", "60"])
    proto = d / "nnet.proto"
    proto.write_text(PROTO)
    nnet_initialize.main([str(proto), str(d / "nnet.init")])
    return d


def _train(corpus, out, extra):
    rc = train_lstm_streams.main(
        [f"scp:{corpus}/feats.scp", f"ark:{corpus}/post.ark",
         str(corpus / "nnet.init"), str(out),
         "--learn-rate=1e-3", "--num-stream=8", "--targets-delay=0",
         "--verbose=0"] + extra)
    assert rc == 0
    return Nnet.read(str(out))[1]


def _leaves(params):
    import jax
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]


def test_cli_mesh_matches_single_device(corpus, tmp_path):
    p_single = _train(corpus, tmp_path / "single.nnet", [])
    p_mesh = _train(corpus, tmp_path / "mesh.nnet",
                    ["--mesh", "data=4,model=2"])
    for a, b in zip(_leaves(p_single), _leaves(p_mesh)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_cli_mesh_grouped_matches_ungrouped(corpus, tmp_path):
    p_plain = _train(corpus, tmp_path / "plain.nnet",
                     ["--mesh", "data=4,model=2"])
    p_group = _train(corpus, tmp_path / "group.nnet",
                     ["--mesh", "data=4,model=2", "--step-group", "2"])
    for a, b in zip(_leaves(p_plain), _leaves(p_group)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_cli_mesh_data_only_axis(corpus, tmp_path):
    """data-only mesh (model=1): no TP, pure DP over streams."""
    p_single = _train(corpus, tmp_path / "s.nnet", [])
    p_dp = _train(corpus, tmp_path / "dp.nnet", ["--mesh", "data=8"])
    for a, b in zip(_leaves(p_single), _leaves(p_dp)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_cli_mesh_rejects_bad_spec():
    with pytest.raises(ValueError):
        train_lstm_streams.parse_mesh("data=0")
    with pytest.raises(ValueError):
        train_lstm_streams.parse_mesh("rows=2")
    assert train_lstm_streams.parse_mesh("data=4,model=2") == \
        {"data": 4, "model": 2}
    assert train_lstm_streams.parse_mesh("data=8") == \
        {"data": 8, "model": 1}


def test_cli_mesh_indivisible_streams_fails_fast(corpus, tmp_path):
    with pytest.raises(ValueError, match="divisible"):
        train_lstm_streams.main(
            [f"scp:{corpus}/feats.scp", f"ark:{corpus}/post.ark",
             str(corpus / "nnet.init"), str(tmp_path / "x.nnet"),
             "--num-stream=6", "--mesh", "data=4", "--targets-delay=0"])


def test_cli_mesh_cross_validate(corpus, tmp_path):
    """CV pass under --mesh: same AvgLoss as the single-device CV."""
    rc1, s1 = train_lstm_streams.run_main(
        [f"scp:{corpus}/feats.scp", f"ark:{corpus}/post.ark",
         str(corpus / "nnet.init"), "--cross-validate=true",
         "--num-stream=8", "--targets-delay=0"])
    rc2, s2 = train_lstm_streams.run_main(
        [f"scp:{corpus}/feats.scp", f"ark:{corpus}/post.ark",
         str(corpus / "nnet.init"), "--cross-validate=true",
         "--num-stream=8", "--targets-delay=0",
         "--mesh", "data=4,model=2"])
    assert rc1 == 0 and rc2 == 0
    assert abs(s1.avg_loss() - s2.avg_loss()) < 1e-5


def test_run_recipe_mesh_matches_single_device(corpus, tmp_path):
    """The full recipe (fixed scheduler, 2 iterations, CV passes)
    through --mesh produces the same models as the single-device run."""
    from kaldi_lstm_tpu.tools import run_recipe

    def recipe(d, extra):
        rc = run_recipe.main(
            ["--tr-feats", f"scp:{corpus}/feats.scp",
             "--tr-targets", f"ark:{corpus}/post.ark",
             "--cv-feats", f"scp:{corpus}/feats.scp",
             "--cv-targets", f"ark:{corpus}/post.ark",
             "--proto", str(corpus / "nnet.proto"),
             "--dir", str(d), "--scheduler", "fixed",
             "--learn-rate", "1e-3", "--num-stream", "8",
             "--targets-delay", "0", "--max-iters", "2",
             "--verbose", "0"] + extra)
        assert rc == 0
        return Nnet.read(str(d / "nnet" / "nnet.iter2"))[1]

    (corpus / "nnet.proto").write_text(PROTO)
    p_single = recipe(tmp_path / "exp_s", [])
    p_mesh = recipe(tmp_path / "exp_m",
                    ["--mesh", "data=4,model=2", "--step-group", "2"])
    for a, b in zip(_leaves(p_single), _leaves(p_mesh)):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-6)
