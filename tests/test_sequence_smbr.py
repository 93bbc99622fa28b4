"""Lattice-free sMBR/MPE: the jvp-based expected accuracy must equal
brute-force posterior-weighted path enumeration; its gradient must
match finite differences; silence exclusion and the MPE phone criterion
must behave; and training must raise expected accuracy on the HMM
synthetic task."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.decode.viterbi import PhoneLoopGraph
from kaldi_lstm_tpu.io.transition_model import \
    make_monophone_transition_model
from kaldi_lstm_tpu.train.sequence import (
    DenGraph,
    expected_accuracy,
    smbr_objective,
)

P, SPS = 2, 2


def make_graph():
    tm = make_monophone_transition_model(P, SPS)
    return tm, DenGraph.from_phone_loop(
        PhoneLoopGraph.from_transition_model(tm))


def brute_force_ea(g: DenGraph, loglik, ref, scale=1.0,
                   by_phone=False, sil=()):
    """Posterior-weighted accuracy over ALL paths."""
    ns = g.logA.shape[0]
    T = loglik.shape[0]
    em = scale * np.asarray(loglik)[:, np.asarray(g.state_pdf)]
    logA = np.asarray(g.logA)
    lab = np.asarray(g.state_phone if by_phone else g.state_pdf)
    phones = np.asarray(g.state_phone)
    logZ = -np.inf
    acc_sum = {}
    for path in itertools.product(range(ns), repeat=T):
        s = float(g.start_logp[path[0]]) + em[0, path[0]]
        for t in range(1, T):
            s += logA[path[t - 1], path[t]] + em[t, path[t]]
        s += float(g.final_logp[path[-1]])
        a = sum(1.0 for t in range(T)
                if lab[path[t]] == ref[t] and phones[path[t]] not in sil)
        logZ = np.logaddexp(logZ, s)
        acc_sum[path] = (s, a)
    return sum(np.exp(s - logZ) * a for s, a in acc_sum.values())


def test_expected_accuracy_matches_brute_force():
    tm, g = make_graph()
    rng = np.random.RandomState(0)
    T = 4
    ll = jnp.asarray(rng.randn(1, T, tm.num_pdfs), jnp.float32)
    ref = jnp.asarray(rng.randint(0, tm.num_pdfs, (1, T)), jnp.int32)
    mask = jnp.ones((1, T), jnp.float32)
    got = float(expected_accuracy(g, ll, ref, mask, 0.7)[0])
    want = brute_force_ea(g, np.asarray(ll)[0], np.asarray(ref)[0], 0.7)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_expected_accuracy_mpe_and_silence():
    tm, g = make_graph()
    rng = np.random.RandomState(1)
    T = 3
    ll = jnp.asarray(rng.randn(1, T, tm.num_pdfs), jnp.float32)
    phones_ref = jnp.asarray(rng.randint(1, P + 1, (1, T)), jnp.int32)
    mask = jnp.ones((1, T), jnp.float32)
    got = float(expected_accuracy(g, ll, phones_ref, mask, 1.0,
                                  criterion="mpe")[0])
    want = brute_force_ea(g, np.asarray(ll)[0],
                          np.asarray(phones_ref)[0], 1.0, by_phone=True)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # excluding phone 1 from the accuracy
    got_s = float(expected_accuracy(
        g, ll, phones_ref, mask, 1.0, criterion="mpe",
        silence_phones=jnp.asarray([1], jnp.int32))[0])
    want_s = brute_force_ea(g, np.asarray(ll)[0],
                            np.asarray(phones_ref)[0], 1.0,
                            by_phone=True, sil=(1,))
    np.testing.assert_allclose(got_s, want_s, rtol=1e-5)
    assert got_s <= got + 1e-6


def test_smbr_gradient_finite_difference():
    tm, g = make_graph()
    rng = np.random.RandomState(2)
    T = 4
    ll = rng.randn(1, T, tm.num_pdfs).astype(np.float32)
    ref = rng.randint(0, tm.num_pdfs, (1, T)).astype(np.int32)
    mask = np.ones((1, T), np.float32)

    def f(x):
        return smbr_objective(g, x, jnp.asarray(ref),
                              jnp.asarray(mask), 0.9)[0]

    grad = np.asarray(jax.grad(f)(jnp.asarray(ll)))
    eps = 1e-3
    for (b, t, k) in [(0, 0, 0), (0, 1, 2), (0, 3, 1)]:
        d = np.zeros_like(ll)
        d[b, t, k] = eps
        fd = (float(f(jnp.asarray(ll + d)))
              - float(f(jnp.asarray(ll - d)))) / (2 * eps)
        np.testing.assert_allclose(grad[b, t, k], fd, rtol=2e-2,
                                   atol=2e-4)


def test_masking_equals_short_utterance():
    tm, g = make_graph()
    rng = np.random.RandomState(3)
    ll = rng.randn(1, 6, tm.num_pdfs).astype(np.float32)
    ref = rng.randint(0, tm.num_pdfs, (1, 6)).astype(np.int32)
    mask = np.zeros((1, 6), np.float32)
    mask[0, :4] = 1.0
    full = float(expected_accuracy(
        g, jnp.asarray(ll), jnp.asarray(ref), jnp.asarray(mask))[0])
    short = float(expected_accuracy(
        g, jnp.asarray(ll[:, :4]), jnp.asarray(ref[:, :4]),
        jnp.ones((1, 4), jnp.float32))[0])
    np.testing.assert_allclose(full, short, rtol=1e-5)


def test_smbr_training_raises_expected_accuracy(tmp_path):
    """End-to-end CLI: xent-trained HMM synthetic model, one sMBR
    iteration -> ExpectedAccuracy/frame goes up (train set)."""
    import re
    from kaldi_lstm_tpu.tools.make_hmm_synth_data import main as mk
    from kaldi_lstm_tpu.tools.nnet_initialize import main as init_main
    from kaldi_lstm_tpu.tools.train_lstm_streams import main as tr_main
    from kaldi_lstm_tpu.tools.nnet_train_smbr import main as smbr_main
    from kaldi_lstm_tpu.tools.ali_to_pdf import main as alipdf_main
    from kaldi_lstm_tpu.tools.ali_to_post import main as alipost_main

    d = tmp_path
    assert mk(["--dir", str(d), "--num-utts", "20", "--feat-dim", "8",
               "--num-phones", "3", "--states-per-phone", "2",
               "--seed", "0"]) == 0
    assert alipdf_main([str(d / "final.mdl"), f"ark:{d}/ali.ark",
                        f"ark:{d}/pdf_ali.ark"]) == 0
    assert alipost_main([f"ark:{d}/pdf_ali.ark",
                         f"ark:{d}/post.ark"]) == 0
    proto = d / "nnet.proto"
    proto.write_text(
        "<NnetProto>\n"
        "<LstmProjectedStreams> <InputDim> 8 <OutputDim> 12 <CellDim> 16"
        " <ParamScale> 0.08 <NumStream> 4\n"
        "<AffineTransform> <InputDim> 12 <OutputDim> 6 <ParamStddev> 0.1\n"
        "<Softmax> <InputDim> 6 <OutputDim> 6\n"
        "</NnetProto>\n")
    assert init_main([str(proto), str(d / "nnet.iter0")]) == 0
    for i in range(2):
        assert tr_main([f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
                        str(d / f"nnet.iter{i}"),
                        str(d / f"nnet.iter{i+1}"),
                        "--learn-rate=5e-3", "--num-stream=4",
                        "--targets-delay=0"]) == 0

    def run(model, cv, out=None, capsys=None):
        args = [f"scp:{d}/feats.scp", f"ark:{d}/ali.ark",
                str(d / "final.mdl"), str(model)]
        if out:
            args.append(str(out))
        args += ["--learn-rate=2e-3", "--acoustic-scale=1.0",
                 "--length-bucket=32"]
        if cv:
            args += ["--cross-validate=true"]
        return args

    import contextlib, io as _io
    def ea_of(args):
        buf = _io.StringIO()
        with contextlib.redirect_stderr(buf):
            assert smbr_main(args) == 0
        m = re.search(r"Accuracy/frame: ([0-9.]+)", buf.getvalue())
        return float(m.group(1))

    before = ea_of(run(d / "nnet.iter2", cv=True))
    ea_of(run(d / "nnet.iter2", cv=False, out=d / "nnet.smbr"))
    after = ea_of(run(d / "nnet.smbr", cv=True))
    assert after > before, (before, after)


def test_smbr_skip_nonfinite_reverts_and_continues(tmp_path):
    """--skip-nonfinite: an absurd LR reliably produces a non-finite
    per-utt expected accuracy; default behavior raises, the flag
    reverts the poisoned update, counts the utt under 'other errors',
    and still writes a loadable model (round-5 LVCSR lesson: one bad
    utt/LR combination must not abort a sequence pass)."""
    import pytest
    from kaldi_lstm_tpu.tools.make_hmm_synth_data import main as mk
    from kaldi_lstm_tpu.tools.nnet_initialize import main as init_main
    from kaldi_lstm_tpu.tools.nnet_train_smbr import main as smbr_main

    d = tmp_path
    assert mk(["--dir", str(d), "--num-utts", "8", "--feat-dim", "8",
               "--num-phones", "3", "--states-per-phone", "2",
               "--seed", "0"]) == 0
    proto = d / "nnet.proto"
    proto.write_text(
        "<NnetProto>\n"
        "<LstmProjectedStreams> <InputDim> 8 <OutputDim> 12 <CellDim> 16"
        " <ParamScale> 0.08 <NumStream> 4\n"
        "<AffineTransform> <InputDim> 12 <OutputDim> 6 <ParamStddev> 0.1\n"
        "<Softmax> <InputDim> 6 <OutputDim> 6\n"
        "</NnetProto>\n")
    assert init_main([str(proto), str(d / "nnet.iter0")]) == 0
    # inject a NaN parameter: every utterance's expected accuracy is
    # then non-finite, deterministically exercising the guard path
    from kaldi_lstm_tpu.models import Nnet
    import numpy as np
    nnet0, params0 = Nnet.read(str(d / "nnet.iter0"))
    params0 = list(params0)
    bias_key = [k for k in params0[1] if "bias" in k][0]
    b = np.array(params0[1][bias_key])
    b[0] = np.nan
    params0[1] = {**params0[1], bias_key: b}
    nnet0.write(str(d / "nnet.bad"), params0, binary=True)
    base = [f"scp:{d}/feats.scp", f"ark:{d}/ali.ark",
            str(d / "final.mdl"), str(d / "nnet.bad"),
            str(d / "nnet.smbr"),
            "--learn-rate=2e-3", "--acoustic-scale=1.0",
            "--length-bucket=32"]
    with pytest.raises(FloatingPointError):
        smbr_main(base)
    assert smbr_main(base + ["--skip-nonfinite=true"]) == 0
    nnet, params = Nnet.read(str(d / "nnet.smbr"))
    assert nnet.output_dim == 6
