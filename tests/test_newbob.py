"""run_recipe --scheduler newbob (upstream train_scheduler.sh logic)."""

import os

import numpy as np
import pytest

from kaldi_lstm_tpu.tools import run_recipe


class StubTrainer:
    """Replaces tools.train_lstm_streams inside run_recipe: training
    copies model files; CV returns scripted AvgLoss values."""

    def __init__(self, cv_losses):
        self.cv_losses = list(cv_losses)  # consumed per CV call
        self.train_lrs = []

    def main(self, argv):
        if "--cross-validate=true" in argv:
            # fixed-scheduler CV call: [cv_feats, cv_targets, model,
            # --cross-validate=true, ...] — nothing is written (a past
            # version of this stub blindly took argv[3] as the output
            # and committed a file literally named '--cross-validate=true')
            if self.cv_losses:
                self.cv_losses.pop(0)
            return 0
        # train call: [tr_feats, tr_targets, cur, nxt, --learn-rate=..]
        cur, nxt = argv[2], argv[3]
        assert not nxt.startswith("-"), f"flag-shaped model-out {nxt!r}"
        lr = [a for a in argv if a.startswith("--learn-rate=")][0]
        self.train_lrs.append(float(lr.split("=")[1]))
        with open(cur) as f, open(nxt, "w") as g:
            g.write(f.read() + "+")
        return 0

    def run_main(self, argv):
        class S:
            def __init__(self, v):
                self.v = v

            def avg_loss(self):
                return self.v

        return 0, S(self.cv_losses.pop(0))


def _run(tmp_path, cv_losses, monkeypatch, extra=()):
    d = tmp_path / "exp"
    os.makedirs(d / "nnet")
    (d / "nnet.init").write_text("M0")
    stub = StubTrainer(cv_losses)
    monkeypatch.setattr(run_recipe, "train_lstm_streams", stub)
    rc = run_recipe.main([
        "--tr-feats", "scp:x", "--tr-targets", "ark:x",
        "--cv-feats", "scp:x", "--cv-targets", "ark:x",
        "--dir", str(d), "--scheduler", "newbob",
        "--learn-rate", "1.0", "--max-iters", "6"] + list(extra))
    return rc, stub, d


def test_newbob_accept_reject_halve_stop(tmp_path, monkeypatch):
    # base 10.0; it1 9.0 accepted (impr .1); it2 8.95 accepted
    # (impr .0056 < .01 -> halving on); it3 8.97 rejected AND
    # rel_impr < end -> stop
    rc, stub, d = _run(tmp_path, [10.0, 9.0, 8.95, 8.97], monkeypatch)
    assert rc == 0
    assert os.path.exists(d / "nnet" / "nnet.iter3_rejected")
    assert not os.path.exists(d / "nnet" / "nnet.iter3")
    # final model is the last ACCEPTED one (iter2)
    assert (d / "final.nnet").read_text() == "M0++"
    # lr 1.0 for iters 1-2, halved to 0.5 for iter 3
    assert stub.train_lrs == [1.0, 1.0, 0.5]


def test_newbob_min_iters_forces_continue(tmp_path, monkeypatch):
    # improvements immediately tiny, but min_iters=3 keeps accepting
    # and continuing
    rc, stub, d = _run(tmp_path,
                       [10.0, 9.999, 9.998, 9.997, 9.9969], monkeypatch,
                       extra=["--min-iters", "3"])
    assert rc == 0
    # iters 1-3 always accepted due to min_iters; iter 4 ran then stopped
    assert len(stub.train_lrs) == 4
    # halving engages after iter 1 (impr < 0.01); the min_iters
    # "continue" skips further annealing (upstream order), so lr stays
    assert stub.train_lrs == [1.0, 0.5, 0.5, 0.5]
    assert (d / "final.nnet").read_text() == "M0++++"


def test_newbob_rejected_restarts_from_previous(tmp_path, monkeypatch):
    # it1 accepted; it2 worse -> rejected; it3 trains from it1 again
    rc, stub, d = _run(tmp_path, [10.0, 5.0, 6.0, 4.9, 4.895, 4.894],
                       monkeypatch)
    assert rc == 0
    assert os.path.exists(d / "nnet" / "nnet.iter2_rejected")
    # iter3 output was built from iter1's content (one '+'), not iter2's
    assert (d / "nnet" / "nnet.iter3").read_text() == "M0++"


def test_newbob_blowup_rejected_within_min_iters(tmp_path, monkeypatch):
    """A diverged iteration (CV loss doubling) is rejected even inside
    min_iters (round-5 guard: upstream force-accepts and the diverged
    model becomes the training base — measured failure mode on the
    hard-16624 configs); halving then retries from the good model."""
    # base 10.0; it1 9.0 accepted; it2 463.0 = BLOWUP -> rejected
    # despite min_iters 3; halving on; it3 trains FROM it1 at lr 0.5,
    # 8.0 accepted; it4 7.995 accepted then stop on end-halving
    rc, stub, d = _run(tmp_path, [10.0, 9.0, 463.0, 8.0, 7.995],
                       monkeypatch, extra=["--min-iters", "3"])
    assert rc == 0
    assert os.path.exists(d / "nnet" / "nnet.iter2_rejected")
    # iter3 restarted from iter1's weights (one '+'), not the blowup
    assert (d / "nnet" / "nnet.iter3").read_text() == "M0++"
    assert stub.train_lrs == [1.0, 1.0, 0.5, 0.25]
    assert (d / "final.nnet").read_text() == "M0+++"


def test_newbob_blowup_guard_off_restores_upstream(tmp_path, monkeypatch):
    """--reject-blowup 0 reproduces exact train_scheduler.sh behavior:
    the diverged iteration is force-accepted within min_iters."""
    rc, stub, d = _run(tmp_path, [10.0, 9.0, 463.0, 8.0, 7.995],
                       monkeypatch,
                       extra=["--min-iters", "3", "--reject-blowup", "0"])
    assert rc == 0
    # iter2 accepted (no _rejected file); iter3 built on top of it
    assert not os.path.exists(d / "nnet" / "nnet.iter2_rejected")
    assert (d / "nnet" / "nnet.iter3").read_text() == "M0+++"


@pytest.mark.slow
def test_newbob_e2e_learns(tmp_path):
    """Real run on a learnable synthetic task: newbob terminates and the
    final CV loss improves on the initial model's."""
    from kaldi_lstm_tpu.tools import make_synth_data, nnet_initialize
    tr, cv = tmp_path / "tr", tmp_path / "cv"
    for split, seed in ((tr, 1), (cv, 2)):
        make_synth_data.main(["--dir", str(split), "--num-utts", "12",
                              "--feat-dim", "6", "--num-classes", "8",
                              "--seed", str(seed), "--label-seed", "7",
                              "--max-len", "60"])
    proto = tmp_path / "nnet.proto"
    proto.write_text(
        "<NnetProto>\n"
        "<LstmProjectedStreams> <InputDim> 6 <OutputDim> 12 <CellDim> 16 "
        "<ParamScale> 0.05 <NumStream> 4\n"
        "<AffineTransform> <InputDim> 12 <OutputDim> 8 <ParamStddev> 0.1\n"
        "<Softmax> <InputDim> 8 <OutputDim> 8\n"
        "</NnetProto>\n")
    d = tmp_path / "exp"
    rc = run_recipe.main([
        "--tr-feats", f"scp:{tr}/feats.scp",
        "--tr-targets", f"ark:{tr}/post.ark",
        "--cv-feats", f"scp:{cv}/feats.scp",
        "--cv-targets", f"ark:{cv}/post.ark",
        "--dir", str(d), "--proto", str(proto),
        "--scheduler", "newbob", "--learn-rate", "3e-4",
        "--targets-delay", "0", "--max-iters", "4", "--min-iters", "1",
        "--verbose", "0"])
    assert rc == 0
    assert os.path.exists(d / "final.nnet")
    # the accepted final model must beat the initial one on CV
    from kaldi_lstm_tpu.tools.train_lstm_streams import run_main

    def cv_loss(model):
        _, s = run_main([f"scp:{cv}/feats.scp", f"ark:{cv}/post.ark",
                         str(model), "--cross-validate=true",
                         "--targets-delay=0", "--num-stream=4",
                         "--verbose=0"])
        return s.avg_loss()

    assert cv_loss(d / "final.nnet") < cv_loss(d / "nnet.init")


def test_newbob_resume(tmp_path, monkeypatch):
    """Killing a newbob run mid-way and restarting continues from the
    journaled iteration instead of retraining from scratch."""
    d = tmp_path / "exp"
    os.makedirs(d / "nnet")
    (d / "nnet.init").write_text("M0")
    # first run: losses for initial CV + 2 iterations, then crash (no
    # more scripted values -> IndexError)
    stub = StubTrainer([10.0, 9.0, 8.0])
    monkeypatch.setattr(run_recipe, "train_lstm_streams", stub)
    argv = ["--tr-feats", "scp:x", "--tr-targets", "ark:x",
            "--cv-feats", "scp:x", "--cv-targets", "ark:x",
            "--dir", str(d), "--scheduler", "newbob",
            "--learn-rate", "1.0", "--max-iters", "4"]
    with pytest.raises(IndexError):
        run_recipe.main(argv)
    assert os.path.exists(d / "nnet" / "newbob.state")
    trained_before = len(stub.train_lrs)
    # resume: only CV losses for the REMAINING iterations are consumed
    stub2 = StubTrainer([7.5, 7.49])
    monkeypatch.setattr(run_recipe, "train_lstm_streams", stub2)
    assert run_recipe.main(argv) == 0
    # iterations 1-2 were not retrained
    assert trained_before == 3  # initial 2 accepted + the crashed 3rd
    assert len(stub2.train_lrs) == 2  # only iters 3 (re-run) and 4
    assert (d / "final.nnet").read_text() == "M0++++"


def test_fixed_scheduler_skips_only_valid_models(tmp_path, monkeypatch):
    """A zero-byte nnet.iterN left by a killed run must NOT count as a
    completed iteration on resume (run_recipe validates size)."""
    import os
    d = tmp_path / "exp"
    os.makedirs(d / "nnet")
    (d / "nnet.init").write_text("M0")
    (d / "nnet" / "nnet.iter1").write_text("M1")
    (d / "nnet" / "nnet.iter2").write_text("")   # killed mid-write
    stub = StubTrainer([5.0, 4.0, 3.0, 2.0])
    monkeypatch.setattr(run_recipe, "train_lstm_streams", stub)
    rc = run_recipe.main(
        ["--tr-feats", "scp:x", "--tr-targets", "ark:x",
         "--cv-feats", "scp:x", "--cv-targets", "ark:x",
         "--dir", str(d), "--scheduler", "fixed",
         "--learn-rate", "1.0", "--max-iters", "2"])
    assert rc == 0
    # iteration 2 was re-trained: its model is the stub's output now
    assert (d / "nnet" / "nnet.iter2").read_text() != ""
