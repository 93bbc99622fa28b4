"""compute-cmvn-stats / apply-cmvn table tools: stats wire format
(double "DM" matrices), per-utterance and per-speaker aggregation,
mean/variance normalization, reverse round-trip, and agreement with the
CMVN feature-transform net on the same data."""

import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    MatrixWriter,
    SequentialMatrixReader,
)
from kaldi_lstm_tpu.tools.apply_cmvn import apply_cmvn, main as apply_main
from kaldi_lstm_tpu.tools.compute_cmvn_stats import (
    main as stats_main,
    stats_of,
)


def _write_corpus(d, utts):
    with MatrixWriter(f"ark,scp:{d}/feats.ark,{d}/feats.scp") as w:
        for k, m in utts.items():
            w.write(k, m)


def test_stats_and_apply_per_utt(tmp_path):
    d = str(tmp_path)
    rng = np.random.RandomState(0)
    utts = {f"u{i}": (rng.randn(20 + i, 5) * (i + 1) + i)
            .astype(np.float32) for i in range(3)}
    _write_corpus(d, utts)
    assert stats_main([f"scp:{d}/feats.scp",
                       f"ark,scp:{d}/cmvn.ark,{d}/cmvn.scp"]) == 0
    stats = dict(SequentialMatrixReader(f"scp:{d}/cmvn.scp"))
    for k, m in utts.items():
        assert stats[k].dtype == np.float64      # DM on the wire
        np.testing.assert_allclose(stats[k], stats_of(m), rtol=1e-12)

    assert apply_main([f"scp:{d}/cmvn.scp", f"scp:{d}/feats.scp",
                       f"ark:{d}/norm.ark", "--norm-vars=true"]) == 0
    for k, m in SequentialMatrixReader(f"ark:{d}/norm.ark"):
        np.testing.assert_allclose(m.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(m.var(0), 1.0, atol=1e-3)

    # reverse round-trips back to the original features
    assert apply_main([f"scp:{d}/cmvn.scp", f"ark:{d}/norm.ark",
                       f"ark:{d}/rt.ark", "--norm-vars=true",
                       "--reverse=true"]) == 0
    for k, m in SequentialMatrixReader(f"ark:{d}/rt.ark"):
        np.testing.assert_allclose(m, utts[k], atol=2e-4)


def test_per_speaker_aggregation(tmp_path):
    d = str(tmp_path)
    rng = np.random.RandomState(1)
    utts = {"a1": rng.randn(30, 4).astype(np.float32) + 3.0,
            "a2": rng.randn(50, 4).astype(np.float32) + 3.0,
            "b1": rng.randn(40, 4).astype(np.float32) - 2.0}
    _write_corpus(d, utts)
    with open(f"{d}/spk2utt", "w") as f:
        f.write("spkA a1 a2\nspkB b1\n")
    with open(f"{d}/utt2spk", "w") as f:
        f.write("a1 spkA\na2 spkA\nb1 spkB\n")
    assert stats_main([f"scp:{d}/feats.scp", f"ark:{d}/cmvn.ark",
                       "--spk2utt", f"ark:{d}/spk2utt"]) == 0
    stats = dict(SequentialMatrixReader(f"ark:{d}/cmvn.ark"))
    assert sorted(stats) == ["spkA", "spkB"]
    np.testing.assert_allclose(
        stats["spkA"], stats_of(utts["a1"]) + stats_of(utts["a2"]),
        rtol=1e-12)

    assert apply_main([f"ark:{d}/cmvn.ark", f"scp:{d}/feats.scp",
                       f"ark:{d}/norm.ark", "--utt2spk",
                       f"ark:{d}/utt2spk"]) == 0
    norm = dict(SequentialMatrixReader(f"ark:{d}/norm.ark"))
    # per-speaker mean over ALL the speaker's frames is zero...
    allA = np.concatenate([norm["a1"], norm["a2"]], 0)
    np.testing.assert_allclose(allA.mean(0), 0.0, atol=1e-4)
    # ...but a single utterance's mean generally is not
    assert np.abs(norm["a1"].mean(0)).max() > 1e-3
    # speaker-B normalization uses B's own stats
    mB = stats_of(utts["b1"])
    np.testing.assert_allclose(
        norm["b1"], utts["b1"] - (mB[0, :4] / mB[0, 4]), atol=1e-5)


def test_matches_cmvn_transform_net(tmp_path):
    """Global (single-speaker) apply-cmvn --norm-vars equals the
    AddShift+Rescale transform net on the same corpus."""
    import jax.numpy as jnp

    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.compute_cmvn_transform import \
        main as transf_main

    d = str(tmp_path)
    rng = np.random.RandomState(2)
    utts = {f"u{i}": (rng.randn(25, 6) * 2.0 + 1.5).astype(np.float32)
            for i in range(3)}
    _write_corpus(d, utts)
    with open(f"{d}/spk2utt", "w") as f:
        f.write("glob " + " ".join(sorted(utts)) + "\n")
    with open(f"{d}/utt2spk", "w") as f:
        for k in utts:
            f.write(f"{k} glob\n")
    assert stats_main([f"scp:{d}/feats.scp", f"ark:{d}/cmvn.ark",
                       "--spk2utt", f"ark:{d}/spk2utt"]) == 0
    assert apply_main([f"ark:{d}/cmvn.ark", f"scp:{d}/feats.scp",
                       f"ark:{d}/norm.ark", "--utt2spk",
                       f"ark:{d}/utt2spk", "--norm-vars=true"]) == 0
    assert transf_main([f"scp:{d}/feats.scp", f"{d}/transf.net"]) == 0
    transf, tp = Nnet.read(f"{d}/transf.net")
    for k, m in SequentialMatrixReader(f"ark:{d}/norm.ark"):
        want = np.asarray(transf.feedforward(
            tp, jnp.asarray(utts[k][None]))[0])
        np.testing.assert_allclose(m, want, atol=2e-4)


def test_cmvn_to_nnet_matches_direct_transform(tmp_path):
    """compute-cmvn-stats | cmvn-to-nnet produces the same transform as
    compute_cmvn_transform estimated directly from the features."""
    import numpy as np
    from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.cmvn_to_nnet import main as c2n
    from kaldi_lstm_tpu.tools.compute_cmvn_stats import main as stats_main
    from kaldi_lstm_tpu.tools.compute_cmvn_transform import (
        main as transf_main)
    rng = np.random.RandomState(0)
    with MatrixWriter(f"ark,scp:{tmp_path}/f.ark,{tmp_path}/f.scp") as w:
        for i in range(5):
            w.write(f"u{i}", (rng.randn(30 + i, 6) * (i + 1)
                              + i).astype(np.float32))
    assert stats_main([f"scp:{tmp_path}/f.scp",
                       f"ark:{tmp_path}/cmvn.ark"]) == 0
    assert c2n([f"ark:{tmp_path}/cmvn.ark",
                f"{tmp_path}/tr_from_stats.nnet"]) == 0
    assert transf_main([f"scp:{tmp_path}/f.scp",
                        f"{tmp_path}/tr_direct.nnet"]) == 0
    n1, p1 = Nnet.read(f"{tmp_path}/tr_from_stats.nnet")
    n2, p2 = Nnet.read(f"{tmp_path}/tr_direct.nnet")
    np.testing.assert_allclose(np.asarray(p1[0]["shift"]),
                               np.asarray(p2[0]["shift"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1[1]["scale"]),
                               np.asarray(p2[1]["scale"]), rtol=1e-4)
