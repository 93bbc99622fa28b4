"""Frame-shuffled trainer (nnet-train-frmshuff): randomizer window
semantics and the CLI end-to-end on the synthetic corpus (a spliced DNN
must learn the frame-level task; frame weights must gate the loss)."""

import re

import numpy as np

from kaldi_lstm_tpu.train.randomizer import FrameRandomizer


def _post(labels):
    return [[(int(l), 1.0)] for l in labels]


def test_randomizer_window_and_padding():
    rng = np.random.RandomState(0)
    feats = rng.randn(10, 3).astype(np.float32)
    labels = np.arange(10)
    r = FrameRandomizer(dim=3, size=8, minibatch=4, kmax=1, seed=1)
    taken = r.add(feats, _post(labels))
    assert taken == 8 and r.full
    batches = list(r.drain())
    assert len(batches) == 2 and r.filled == 0
    # leftover rows go into the next window
    taken2 = r.add(feats[taken:], _post(labels[taken:]))
    assert taken2 == 2
    batches += list(r.drain())
    # the partial batch is padded with zero-weight rows
    f, i, w, fw = batches[-1]
    assert f.shape == (4, 1, 3) and fw[2:].sum() == 0.0
    # every original frame appears exactly once with weight 1
    ids = []
    for f_, i_, w_, fw_ in batches:
        for k in range(4):
            if fw_[k, 0] > 0:
                ids.append(int(i_[k, 0, 0]))
    assert sorted(ids) == list(range(10))


def test_randomizer_seed_determinism_and_order():
    feats = np.arange(24, dtype=np.float32).reshape(8, 3)
    labels = np.arange(8)

    def order(seed, randomize=True):
        r = FrameRandomizer(3, size=8, minibatch=8, kmax=1, seed=seed,
                            randomize=randomize)
        r.add(feats, _post(labels))
        (f, i, w, fw), = list(r.drain())
        return [int(v) for v in i[:, 0, 0]]

    assert order(5) == order(5)
    assert order(5) != order(6)
    assert order(9, randomize=False) == list(range(8))


def test_frmshuff_cli_end_to_end(tmp_path, capfd):
    """Spliced DNN on the synthetic task (labels depend on the current
    and previous frame): frame accuracy must climb well above chance
    and the CV loss must drop between epochs."""
    import jax

    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.make_synth_data import main as mksynth
    from kaldi_lstm_tpu.tools.nnet_train_frmshuff import main as frmshuff

    d = str(tmp_path)
    K, D = 8, 6
    assert mksynth(["--dir", d, "--num-utts", "30", "--feat-dim", str(D),
                    "--num-classes", str(K), "--min-len", "40",
                    "--max-len", "80"]) == 0

    # feature transform: splice the previous frame in
    tn, tp = Nnet.init_from_proto(
        f"<NnetProto>\n<Splice> <InputDim> {D} <OutputDim> {2 * D} "
        f"<BuildVector> -1:0\n</NnetProto>", jax.random.PRNGKey(1))
    tn.write(f"{d}/transf.net", tp, binary=True)

    proto = f"""<NnetProto>
<AffineTransform> <InputDim> {2 * D} <OutputDim> 32 <ParamStddev> 0.2
<Sigmoid> <InputDim> 32 <OutputDim> 32
<AffineTransform> <InputDim> 32 <OutputDim> {K} <ParamStddev> 0.2
<Softmax> <InputDim> {K} <OutputDim> {K}
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    nnet.write(f"{d}/dnn.init", params, binary=True)

    def cv_loss(model):
        capfd.readouterr()
        assert frmshuff([f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
                         model, "--cross-validate=true",
                         "--feature-transform", f"{d}/transf.net",
                         "--minibatch-size=128",
                         "--randomizer-size=4096"]) == 0
        err = capfd.readouterr().err
        m = re.search(r"AvgLoss: ([0-9.eE+-]+)", err)
        a = re.search(r"FRAME_ACCURACY >> ([0-9.]+)% <<", err)
        assert m and a, err
        return float(m.group(1)), float(a.group(1))

    loss0, acc0 = cv_loss(f"{d}/dnn.init")
    cur = f"{d}/dnn.init"
    for i in range(2):
        nxt = f"{d}/dnn.it{i + 1}"
        assert frmshuff([f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
                         cur, nxt, "--learn-rate=0.15",
                         "--feature-transform", f"{d}/transf.net",
                         "--minibatch-size=128",
                         "--randomizer-size=4096"]) == 0
        cur = nxt
    loss1, acc1 = cv_loss(cur)
    assert loss1 < loss0, (loss0, loss1)
    assert acc1 > acc0 + 10.0, (acc0, acc1)  # well above initial
    assert acc1 > 2.0 * (100.0 / K), (acc0, acc1)  # 2x chance


def test_frmshuff_frame_weights(tmp_path, capfd):
    """Zero frame weights exclude frames: total frame count halves."""
    import jax

    from kaldi_lstm_tpu.io.kaldi_io import (SequentialMatrixReader,
                                            TableWriter, write_vector)
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.make_synth_data import main as mksynth
    from kaldi_lstm_tpu.tools.nnet_train_frmshuff import main as frmshuff

    d = str(tmp_path)
    K, D = 6, 5
    assert mksynth(["--dir", d, "--num-utts", "6", "--feat-dim", str(D),
                    "--num-classes", str(K), "--min-len", "20",
                    "--max-len", "40"]) == 0
    lens = {k: m.shape[0]
            for k, m in SequentialMatrixReader(f"scp:{d}/feats.scp")}
    # weight 1 on even frames, 0 on odd
    with TableWriter(f"ark:{d}/fw.ark", write_vector) as tw:
        for k, L in lens.items():
            w = np.zeros(L, np.float32)
            w[::2] = 1.0
            tw.write(k, w)

    proto = f"""<NnetProto>
<AffineTransform> <InputDim> {D} <OutputDim> {K} <ParamStddev> 0.1
<Softmax> <InputDim> {K} <OutputDim> {K}
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    nnet.write(f"{d}/dnn.init", params, binary=True)

    capfd.readouterr()
    assert frmshuff([f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
                     f"{d}/dnn.init", f"{d}/dnn.w", "--learn-rate=0.05",
                     "--frame-weights", f"ark:{d}/fw.ark"]) == 0
    err = capfd.readouterr().err
    total = sum(lens.values())
    kept = sum((L + 1) // 2 for L in lens.values())
    assert kept < total
    # LossStats counts only frames with non-zero weight
    m = re.search(r"(\d+) frames\]", err)
    assert m, err
    assert int(m.group(1)) == kept
    import os
    assert os.path.exists(f"{d}/dnn.w")
