"""Lattice-free MMI over the phone-loop graph: the dense scan forward
must equal brute-force path enumeration; gradients must match finite
differences; masking must equal per-utterance computation; and the
objective must decrease under training on the HMM synthetic task."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.decode.viterbi import PhoneLoopGraph
from kaldi_lstm_tpu.io.transition_model import \
    make_monophone_transition_model
from kaldi_lstm_tpu.train.sequence import (
    DenGraph,
    alignment_to_states,
    den_logprob,
    mmi_objective,
    num_logprob,
)

P, SPS = 2, 2


def make_graph():
    tm = make_monophone_transition_model(P, SPS)
    return tm, DenGraph.from_phone_loop(
        PhoneLoopGraph.from_transition_model(tm))


def brute_force_den(g: DenGraph, loglik, scale=1.0):
    ns = g.logA.shape[0]
    T = loglik.shape[0]
    em = scale * np.asarray(loglik)[:, np.asarray(g.state_pdf)]
    logA = np.asarray(g.logA)
    total = -np.inf
    for path in itertools.product(range(ns), repeat=T):
        s = float(g.start_logp[path[0]]) + em[0, path[0]]
        for t in range(1, T):
            s += logA[path[t - 1], path[t]] + em[t, path[t]]
        s += float(g.final_logp[path[-1]])
        total = np.logaddexp(total, s)
    return total


def test_den_logprob_matches_brute_force():
    tm, g = make_graph()
    rng = np.random.RandomState(0)
    T = 4
    ll = jnp.asarray(rng.randn(1, T, tm.num_pdfs), jnp.float32)
    mask = jnp.ones((1, T), jnp.float32)
    got = float(den_logprob(g, ll, mask, 0.7)[0])
    want = brute_force_den(g, np.asarray(ll)[0], 0.7)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_den_masking_equals_short_utterance():
    tm, g = make_graph()
    rng = np.random.RandomState(1)
    ll = jnp.asarray(rng.randn(2, 6, tm.num_pdfs), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]],
                       jnp.float32)
    batched = den_logprob(g, ll, mask)
    solo = den_logprob(g, ll[:1, :4], jnp.ones((1, 4), jnp.float32))
    np.testing.assert_allclose(float(batched[0]), float(solo[0]),
                               rtol=1e-5)


def test_mmi_gradient_finite_difference():
    tm, g = make_graph()
    rng = np.random.RandomState(2)
    T = 5
    ll = jnp.asarray(rng.randn(1, T, tm.num_pdfs), jnp.float32)
    mask = jnp.ones((1, T), jnp.float32)
    # a valid num path: phone 1 states 0,0,1 then phone 2 states 0,1
    states = jnp.asarray([[0, 0, 1, 2, 3]], jnp.int32)

    def f(x):
        return mmi_objective(g, x, states, mask)[0]

    grad = np.asarray(jax.grad(f)(ll))
    eps = 1e-3
    for idx in [(0, 0, 0), (0, 2, 3), (0, 4, 1)]:
        e = np.zeros_like(np.asarray(ll))
        e[idx] = eps
        fd = (float(f(ll + e)) - float(f(ll - e))) / (2 * eps)
        np.testing.assert_allclose(grad[idx], fd, rtol=2e-3, atol=2e-4)


def test_objective_nonnegative_and_tight_for_peaked():
    """den >= num always; with near-one-hot likelihoods along the num
    path the gap approaches the path-prior constant."""
    tm, g = make_graph()
    states = np.asarray([[0, 0, 1, 2, 3, 3]], np.int32)
    T = states.shape[1]
    ll = np.full((1, T, tm.num_pdfs), -8.0, np.float32)
    pdfs = np.asarray(g.state_pdf)[states[0]]
    ll[0, np.arange(T), pdfs] = 8.0
    mask = jnp.ones((1, T), jnp.float32)
    obj_peaked, _ = mmi_objective(g, jnp.asarray(ll), states, mask)
    obj_flat, _ = mmi_objective(
        g, jnp.zeros((1, T, tm.num_pdfs), jnp.float32), states, mask)
    assert float(obj_peaked) >= -1e-4
    assert float(obj_peaked) < float(obj_flat)


def test_alignment_to_states():
    tm = make_monophone_transition_model(3, 2)
    # tids 1,2 belong to tuple 0; 3,4 tuple 1; ...
    tids = np.asarray([1, 2, 3, 4, 5, 12])
    np.testing.assert_array_equal(alignment_to_states(tm, tids),
                                  [0, 0, 1, 1, 2, 5])


def test_mmi_cli_end_to_end(tmp_path, capfd):
    """xent pretraining then two MMI iterations on the HMM corpus: the
    reported AvgMMI(den-num)/frame must decrease across iterations."""
    import re

    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.ali_to_pdf import main as ali_to_pdf
    from kaldi_lstm_tpu.tools.ali_to_post import main as ali_to_post
    from kaldi_lstm_tpu.tools.make_hmm_synth_data import main as mksynth
    from kaldi_lstm_tpu.tools.nnet_train_mmi import main as mmi
    from kaldi_lstm_tpu.tools.train_lstm_streams import main as train

    d = str(tmp_path)
    assert mksynth(["--dir", d, "--num-phones", "3",
                    "--states-per-phone", "2", "--feat-dim", "6",
                    "--num-utts", "30", "--min-phones", "2",
                    "--max-phones", "4"]) == 0
    assert ali_to_pdf([f"{d}/final.mdl", f"ark:{d}/ali.ark",
                       f"ark:{d}/pdf_ali.ark"]) == 0
    assert ali_to_post([f"ark:{d}/pdf_ali.ark", f"ark:{d}/post.ark"]) == 0

    proto = """<NnetProto>
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 12 <CellDim> 16 <ParamScale> 0.08 <NumStream> 4
<AffineTransform> <InputDim> 12 <OutputDim> 6 <ParamStddev> 0.1
<Softmax> <InputDim> 6 <OutputDim> 6
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    nnet.write(f"{d}/nnet.xent0", params, binary=True)
    assert train([f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
                  f"{d}/nnet.xent0", f"{d}/nnet.xent1",
                  "--learn-rate=3e-3", "--num-stream=4",
                  "--targets-delay=0"]) == 0

    capfd.readouterr()
    vals = []
    cur = f"{d}/nnet.xent1"
    for i in range(2):
        nxt = f"{d}/nnet.mmi{i+1}"
        assert mmi([f"scp:{d}/feats.scp", f"ark:{d}/ali.ark",
                    f"{d}/final.mdl", cur, nxt, "--learn-rate=3e-4",
                    "--acoustic-scale=1.0"]) == 0
        err = capfd.readouterr().err
        m = re.search(r"AvgMMI\(den-num\)/frame: ([0-9.eE+-]+)", err)
        assert m, err
        vals.append(float(m.group(1)))
        cur = nxt
    assert vals[1] < vals[0], vals


def test_mmi_training_decreases_objective():
    """A few MMI steps on peaked synthetic emissions must reduce the
    summed objective (gradient sanity at the trainer level)."""
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.train.optim import init_momentum, momentum_update

    tm, g = make_graph()
    K = tm.num_pdfs
    rng = np.random.RandomState(3)
    means = rng.randn(K, 6).astype(np.float32)

    # valid arcs only: within-phone forward/self + loop-back to entries
    states_np = np.asarray([[0, 0, 1, 2, 3, 0, 1, 1]], np.int32)
    pdfs = np.asarray(g.state_pdf)[states_np[0]]
    feats = jnp.asarray(means[pdfs][None] + 0.3 * rng.randn(1, 8, 6),
                        jnp.float32)
    states = jnp.asarray(states_np)
    mask = jnp.ones((1, 8), jnp.float32)

    proto = f"""<NnetProto>
<LstmProjected> <InputDim> 6 <OutputDim> 12 <CellDim> 16 <ParamScale> 0.1
<AffineTransform> <InputDim> 12 <OutputDim> {K} <ParamStddev> 0.1
<Softmax> <InputDim> {K} <OutputDim> {K}
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))

    def objective(params):
        logits, _ = nnet.propagate(params, feats, nnet.init_states(1),
                                   logits=True)
        loglik = jax.nn.log_softmax(logits, axis=-1)
        obj, stat = mmi_objective(g, loglik, states, mask)
        return obj, stat

    opt = init_momentum(params)
    first = last = None
    # lr 0.3 drives 6.26 -> ~0.003 by step 12 on this setup; far more
    # steps would diverge (unregularized MMI overtraining, expected)
    for i in range(15):
        (obj, _), grads = jax.value_and_grad(objective,
                                             has_aux=True)(params)
        if first is None:
            first = float(obj)
        last = float(obj)
        params, opt = momentum_update(params, grads, opt,
                                      jnp.float32(0.3), 0.9, 0.0)
    assert last < first * 0.1, (first, last)
