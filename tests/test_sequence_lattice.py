"""Lattice-based MMI/MPE/sMBR sequence training: forward-backward and
expectation-semiring quantities pinned against brute-force path
enumeration; error derivatives pinned against finite differences of the
brute-force objective; CLI end-to-end on the word-synthesis corpus
(decode lattices once, train against them — the upstream
nnet-train-{mmi,mpe}-sequential recipe flow)."""

import itertools
import math

import numpy as np
import pytest

from kaldi_lstm_tpu.io.lattice import Lattice, LatticeArc
from kaldi_lstm_tpu.io.transition_model import \
    make_monophone_transition_model
from kaldi_lstm_tpu.train.sequence_lattice import (
    as_raw_lattice,
    frame_accuracies,
    lattice_acoustic_rescore,
    lattice_forward_backward,
    mmi_errors,
    mpe_errors,
    mpe_forward_backward,
    state_frames,
)

# test transition model: 2 phones x 2 states, pdf = (phone-1)*2 + state,
# tids 1..8 (self + forward per tuple)
TM = make_monophone_transition_model(2, 2)


def build_lattice() -> Lattice:
    """Hand-built time-synchronous 3-frame lattice with a branch, a
    merge, parallel arcs between the same states, and a trailing
    epsilon arc (non-emitting) before one of two final states.

        s0 -(t1)-> s1 -(t2)-> s3 -(t5)-> s4 -eps-> s5(final)
        s0 -(t5)-> s2 -(t6)-> s3              s4(final too? no)
                   s1 -(t3)-> s3   (parallel arc, same states)
    """
    lat = Lattice()
    s = [lat.add_state() for _ in range(6)]
    lat.start = s[0]
    lat.arcs[0].append(LatticeArc(1, 11, 0.4, 1.0, 1))
    lat.arcs[0].append(LatticeArc(5, 12, 0.7, 0.5, 2))
    lat.arcs[1].append(LatticeArc(2, 0, 0.2, 0.3, 3))
    lat.arcs[1].append(LatticeArc(3, 0, 0.9, 0.1, 3))
    lat.arcs[2].append(LatticeArc(6, 0, 0.1, 0.8, 3))
    lat.arcs[3].append(LatticeArc(5, 13, 0.5, 0.2, 4))
    lat.arcs[4].append(LatticeArc(0, 0, 0.3, 0.0, 5))
    lat.final[5] = (0.6, 0.0)
    return lat


def enum_paths(lat: Lattice):
    """All (arcs, final) complete paths by DFS."""
    out = []

    def dfs(s, path):
        if s in lat.final:
            out.append((list(path), lat.final[s]))
        for a in lat.arcs[s]:
            path.append(a)
            dfs(a.dst, path)
            path.pop()

    dfs(lat.start, [])
    return out


def brute_logZ_and_post(lat, ac_scale=1.0, lm_scale=1.0):
    paths = enum_paths(lat)
    logps = []
    for arcs, fin in paths:
        lp = -(lm_scale * fin[0] + ac_scale * fin[1])
        for a in arcs:
            lp -= lm_scale * a.graph_cost + ac_scale * a.acoustic_cost
        logps.append(lp)
    logZ = np.logaddexp.reduce(logps)
    post = {}
    for (arcs, _fin), lp in zip(paths, logps):
        p = math.exp(lp - logZ)
        t = 0
        for a in arcs:
            if a.ilabel:
                post[(t, a.ilabel)] = post.get((t, a.ilabel), 0.0) + p
                t += 1
    return logZ, post


def test_forward_backward_matches_brute_force():
    lat = build_lattice()
    for ac, lm in [(1.0, 1.0), (0.3, 1.7)]:
        logZ, post = lattice_forward_backward(lat, ac, lm)
        bZ, bpost = brute_logZ_and_post(lat, ac, lm)
        np.testing.assert_allclose(logZ, bZ, rtol=1e-10)
        got = {(t, tid): g for t, d in enumerate(post)
               for tid, g in d.items()}
        assert set(got) == set(bpost)
        for k in got:
            np.testing.assert_allclose(got[k], bpost[k], rtol=1e-9)
        # occupancies sum to one per frame
        for d in post:
            np.testing.assert_allclose(sum(d.values()), 1.0, rtol=1e-9)


def test_state_frames_and_rescore():
    lat = build_lattice()
    frames = state_frames(lat)
    assert frames == [0, 1, 1, 2, 3, 3]
    rng = np.random.RandomState(0)
    ll = rng.randn(3, TM.num_pdfs).astype(np.float64)
    old = [a.acoustic_cost for arcs in lat.arcs for a in arcs]
    lattice_acoustic_rescore(lat, ll, TM, old_acoustic_scale=0.5)
    new = [a.acoustic_cost for arcs in lat.arcs for a in arcs]
    # first arc: frame 0, tid 1 -> pdf 0
    assert new[0] == pytest.approx(0.5 * old[0] - ll[0, 0])
    # epsilon arc only scales
    eps_i = 6
    assert new[eps_i] == pytest.approx(0.5 * old[eps_i])


def test_non_synchronous_lattice_rejected():
    lat = Lattice()
    for _ in range(3):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(1, 0, 0.0, 0.0, 2))
    lat.arcs[0].append(LatticeArc(1, 0, 0.0, 0.0, 1))
    lat.arcs[1].append(LatticeArc(2, 0, 0.0, 0.0, 2))
    lat.final[2] = (0.0, 0.0)
    with pytest.raises(ValueError, match="time-synchronous"):
        state_frames(lat)


def brute_mpe(lat, acc, ac_scale=1.0, lm_scale=1.0):
    """Brute-force E[A] and the mpe posterior
    post(t,tid) = sum_paths p(pi) * 1[pi uses tid at t] * (A(pi)-E[A])."""
    paths = enum_paths(lat)
    logps, accs = [], []
    for arcs, fin in paths:
        lp = -(lm_scale * fin[0] + ac_scale * fin[1])
        A = 0.0
        t = 0
        for a in arcs:
            lp -= lm_scale * a.graph_cost + ac_scale * a.acoustic_cost
            if a.ilabel:
                A += acc(t, a.ilabel)
                t += 1
        logps.append(lp)
        accs.append(A)
    logZ = np.logaddexp.reduce(logps)
    ps = np.exp(np.asarray(logps) - logZ)
    EA = float((ps * np.asarray(accs)).sum())
    post = {}
    for (arcs, _f), p, A in zip(paths, ps, accs):
        t = 0
        for a in arcs:
            if a.ilabel:
                k = (t, a.ilabel)
                post[k] = post.get(k, 0.0) + p * (A - EA)
                t += 1
    return EA, post


def test_mpe_forward_backward_matches_brute_force():
    lat = build_lattice()
    num_tids = np.asarray([1, 2, 5])

    for crit in ("smbr", "mpe"):
        acc = frame_accuracies(lat, TM, num_tids, crit)
        frames = state_frames(lat)
        for ac_s, lm_s in [(1.0, 1.0), (0.4, 1.3)]:
            EA, post = mpe_forward_backward(lat, acc, frames, ac_s, lm_s)
            bEA, bpost = brute_mpe(lat, acc, ac_s, lm_s)
            np.testing.assert_allclose(EA, bEA, rtol=1e-9)
            got = {(t, tid): v for t, d in enumerate(post)
                   for tid, v in d.items()}
            assert set(got) == set(bpost)
            for k in got:
                np.testing.assert_allclose(got[k], bpost[k], atol=1e-12,
                                           rtol=1e-8)
            # signed posteriors sum to zero per frame
            for d in post:
                assert abs(sum(d.values())) < 1e-10


def test_frame_accuracy_silence_conventions():
    num_tids = np.asarray([1, 5])  # ref phones [1, 2], ref pdfs [0, 2]
    lat = build_lattice()
    # default: silence hypothesis scores 0 even when matching
    acc = frame_accuracies(lat, TM, num_tids, "smbr",
                           silence_phones=frozenset([1]))
    assert acc(0, 1) == 0.0           # tid 1 = phone 1 (sil), pdf match
    assert acc(1, 5) == 1.0           # tid 5 = phone 2, pdf 2 == ref
    # one_silence_class: sil-vs-sil counts correct even on pdf mismatch
    acc1 = frame_accuracies(lat, TM, num_tids, "smbr",
                            silence_phones=frozenset([1]),
                            one_silence_class=True)
    assert acc1(0, 3) == 1.0          # tid 3 = phone 1 state 1: sil/sil
    assert acc1(1, 1) == 0.0          # hyp sil but ref phone 2


def _fd_check(objective, diff, ll, idxs, kappa, eps=1e-5, rtol=2e-4):
    """diff is the DESCENT derivative with the acoustic scale folded
    out: d objective / d ll = -kappa * diff."""
    for idx in idxs:
        e = np.zeros_like(ll)
        e[idx] = eps
        fd = (objective(ll + e) - objective(ll - e)) / (2 * eps)
        np.testing.assert_allclose(fd, -kappa * diff[idx],
                                    rtol=rtol, atol=1e-8)


def test_mmi_errors_finite_difference():
    lat = build_lattice()
    num_tids = np.asarray([1, 2, 5])
    rng = np.random.RandomState(1)
    ll = rng.randn(3, TM.num_pdfs)
    kappa, lms = 0.6, 1.2

    def objective(x):
        obj, _, _, _ = mmi_errors(lat, TM, num_tids, x, kappa, lms,
                                  drop_frames=False)
        return obj

    _, diff, dropped, _ = mmi_errors(lat, TM, num_tids, ll, kappa, lms,
                                     drop_frames=False)
    assert dropped == 0
    # every row sums to zero (gamma sums to 1, minus the one-hot)
    np.testing.assert_allclose(diff.sum(axis=1), 0.0, atol=1e-6)
    idxs = [(0, 0), (0, 2), (1, 1), (2, 2), (2, 3)]
    _fd_check(objective, diff, ll, idxs, kappa)


def test_mmi_drop_frames():
    """A frame whose numerator pdf is absent from the lattice gets a
    zeroed diff row and is counted."""
    lat = build_lattice()
    # frame 1 arcs are tids 2 (pdf 0), 3 (pdf 1), 6 (pdf 2); a num tid
    # with pdf 3 (tid 7) at frame 1 -> dropped
    num_tids = np.asarray([1, 7, 5])
    ll = np.zeros((3, TM.num_pdfs))
    _, diff, dropped, _ = mmi_errors(lat, TM, num_tids, ll, 1.0, 1.0,
                                     drop_frames=True)
    assert dropped == 1
    np.testing.assert_allclose(diff[1], 0.0)
    assert np.abs(diff[0]).sum() > 0


def test_mpe_errors_finite_difference():
    lat = build_lattice()
    num_tids = np.asarray([1, 2, 5])
    rng = np.random.RandomState(2)
    ll = rng.randn(3, TM.num_pdfs)
    kappa = 0.8

    for crit in ("smbr", "mpe"):
        def objective(x):
            # E[A] is the MAXIMIZED objective (like MMI's num - logZ):
            # _fd_check asserts d objective / d ll = -kappa * diff
            ea, _ = mpe_errors(lat, TM, num_tids, x, kappa,
                               criterion=crit)
            return ea

        _, diff = mpe_errors(lat, TM, num_tids, ll, kappa,
                             criterion=crit)
        np.testing.assert_allclose(diff.sum(axis=1), 0.0, atol=1e-6)
        idxs = [(0, 0), (0, 2), (1, 1), (1, 3), (2, 2)]
        _fd_check(objective, diff, ll, idxs, kappa)


def test_errors_do_not_mutate_input_lattice():
    lat = build_lattice()
    before = [(a.graph_cost, a.acoustic_cost)
              for arcs in lat.arcs for a in arcs]
    ll = np.zeros((3, TM.num_pdfs))
    mmi_errors(lat, TM, np.asarray([1, 2, 5]), ll)
    mpe_errors(lat, TM, np.asarray([1, 2, 5]), ll)
    after = [(a.graph_cost, a.acoustic_cost)
             for arcs in lat.arcs for a in arcs]
    assert before == after
    # and as_raw_lattice(copy=True) is a deep copy
    cp = as_raw_lattice(lat, copy=True)
    cp.arcs[0][0].acoustic_cost = 123.0
    assert lat.arcs[0][0].acoustic_cost != 123.0


# ---------------------------------------------------------------------------
# CLI end-to-end: decode lattices once, train MMI + sMBR against them
# ---------------------------------------------------------------------------

def test_sequential_cli_end_to_end(tmp_path, capfd):
    import re

    import jax

    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.ali_to_pdf import main as ali_to_pdf
    from kaldi_lstm_tpu.tools.ali_to_post import main as ali_to_post
    from kaldi_lstm_tpu.tools.latgen_faster import main as latgen
    from kaldi_lstm_tpu.tools.make_word_synth_data import main as mksynth
    from kaldi_lstm_tpu.tools.nnet_forward import main as forward
    from kaldi_lstm_tpu.tools.nnet_train_mmi_sequential import \
        main as mmi_seq
    from kaldi_lstm_tpu.tools.nnet_train_mpe_sequential import \
        main as mpe_seq
    from kaldi_lstm_tpu.tools.train_lstm_streams import main as train

    d = str(tmp_path)
    assert mksynth(["--dir", d, "--num-words", "5", "--num-phones", "6",
                    "--states-per-phone", "2", "--num-utts", "20",
                    "--feat-dim", "8", "--max-words", "4",
                    "--emission-noise", "0.5"]) == 0
    assert ali_to_pdf([f"{d}/final.mdl", f"ark:{d}/ali.ark",
                       f"ark:{d}/pdf_ali.ark"]) == 0
    assert ali_to_post([f"ark:{d}/pdf_ali.ark", f"ark:{d}/post.ark"]) == 0

    proto = """<NnetProto>
<LstmProjectedStreams> <InputDim> 8 <OutputDim> 16 <CellDim> 20 <ParamScale> 0.08 <NumStream> 4
<AffineTransform> <InputDim> 16 <OutputDim> 12 <ParamStddev> 0.1
<Softmax> <InputDim> 12 <OutputDim> 12
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    nnet.write(f"{d}/nnet.xent0", params, binary=True)
    assert train([f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
                  f"{d}/nnet.xent0", f"{d}/nnet.xent1",
                  "--learn-rate=3e-3", "--num-stream=4",
                  "--targets-delay=0"]) == 0

    # first-pass decode -> denominator lattices (kept fixed afterwards)
    assert forward([f"{d}/nnet.xent1", f"scp:{d}/feats.scp",
                    f"ark:{d}/loglik.ark", "--apply-log=true"]) == 0
    assert latgen([f"{d}/final.mdl", f"{d}/lexicon.txt", f"{d}/lm.arpa",
                   f"ark:{d}/loglik.ark", f"ark:{d}/lat.ark",
                   "--acoustic-scale", "1.0", "--beam", "16",
                   "--lattice-beam", "6"]) == 0

    capfd.readouterr()
    vals = []
    cur = f"{d}/nnet.xent1"
    for i in range(2):
        nxt = f"{d}/nnet.mmi{i + 1}"
        assert mmi_seq([f"scp:{d}/feats.scp", f"ark:{d}/lat.ark",
                        f"ark:{d}/ali.ark", f"{d}/final.mdl", cur, nxt,
                        "--learn-rate=2e-3", "--acoustic-scale=1.0"]) == 0
        err = capfd.readouterr().err
        m = re.search(r"Overall MMI-objective/frame: ([0-9.eE+-]+)", err)
        assert m, err
        vals.append(float(m.group(1)))
        cur = nxt
    # F = num - logZ_den is maximized
    assert vals[1] > vals[0], vals

    # sMBR: expected accuracy must increase across iterations
    capfd.readouterr()
    accs = []
    cur = f"{d}/nnet.xent1"
    for i in range(2):
        nxt = f"{d}/nnet.smbr{i + 1}"
        assert mpe_seq([f"scp:{d}/feats.scp", f"ark:{d}/lat.ark",
                        f"ark:{d}/ali.ark", f"{d}/final.mdl", cur, nxt,
                        "--learn-rate=2e-3", "--acoustic-scale=1.0",
                        "--do-smbr=true"]) == 0
        err = capfd.readouterr().err
        m = re.search(
            r"Overall expected-SMBR-accuracy/frame: ([0-9.eE+-]+)", err)
        assert m, err
        accs.append(float(m.group(1)))
        cur = nxt
    assert accs[1] > accs[0], accs
