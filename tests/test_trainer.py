"""End-to-end training-step tests: optimizer semantics, loss decrease on
synthetic data, cross-validation purity, carry/reset ordering."""

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import (
    StreamScheduler,
    TrainOptions,
    init_momentum,
    momentum_update,
    run_epoch,
)

PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 8 <CellDim> 10 <ParamScale> 0.1 <NumStream> 2
<AffineTransform> <InputDim> 8 <OutputDim> 5 <ParamStddev> 0.1
<Softmax> <InputDim> 5 <OutputDim> 5
</NnetProto>
"""


class DictTargets:
    def __init__(self, table):
        self.table = table

    def has_key(self, key):
        return key in self.table

    def value(self, key):
        return self.table[key]


def synth_utts(n=8, feat_dim=6, nclass=5, seed=0):
    """Learnable synthetic task: class depends on a linear readout of the
    features, so even a few steps reduce loss."""
    rng = np.random.RandomState(seed)
    W = rng.randn(feat_dim, nclass)
    utts, targets = [], {}
    for i in range(n):
        L = rng.randint(8, 17)
        f = rng.randn(L, feat_dim).astype(np.float32)
        labels = (f @ W).argmax(-1)
        utts.append((f"utt{i}", f))
        targets[f"utt{i}"] = [[(int(l), 1.0)] for l in labels]
    return utts, DictTargets(targets)


def make_sched(seed=0, **kw):
    utts, targets = synth_utts(seed=seed)
    kw.setdefault("num_stream", 2)
    kw.setdefault("batch_size", 5)
    kw.setdefault("targets_delay", 0)
    return StreamScheduler(iter(utts), targets, feat_dim=6, **kw)


def test_momentum_update_matches_reference_recurrence():
    """corr = grad + mmt*corr; w -= lr*corr (…streams.h:465-513)."""
    params = {"w": jnp.array([1.0, 2.0])}
    opt = init_momentum(params)
    g1 = {"w": jnp.array([0.5, -1.0])}
    p1, opt = momentum_update(params, g1, opt, learn_rate=0.1, momentum=0.9)
    np.testing.assert_allclose(p1["w"], [1.0 - 0.05, 2.0 + 0.1])
    g2 = {"w": jnp.array([0.0, 0.0])}
    p2, opt = momentum_update(p1, g2, opt, learn_rate=0.1, momentum=0.9)
    # corr2 = 0 + 0.9*corr1
    np.testing.assert_allclose(
        p2["w"], np.asarray(p1["w"]) - 0.1 * 0.9 * np.asarray([0.5, -1.0]),
        rtol=1e-6)


def test_grad_clip_matches_standard_variant():
    params = {"w": jnp.zeros(2)}
    opt = init_momentum(params)
    g = {"w": jnp.array([100.0, -0.5])}
    p, opt = momentum_update(params, g, opt, learn_rate=1.0, momentum=0.0,
                             grad_clip=50.0)
    np.testing.assert_allclose(p["w"], [-50.0, 0.5])
    # carried momentum buffer is the clipped one
    np.testing.assert_allclose(opt.corr["w"], [50.0, -0.5])


def test_epoch_reduces_loss():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    opts = TrainOptions(learn_rate=0.05, momentum=0.9)
    res1 = run_epoch(nnet, params, make_sched(), opts)
    avg1 = (res1.stats.loss - res1.stats.entropy) / res1.stats.frames
    params, opt_state = res1.params, res1.opt_state
    for _ in range(4):
        res = run_epoch(nnet, params, make_sched(), opts,
                        opt_state=opt_state)
        params, opt_state = res.params, res.opt_state
    avgN = (res.stats.loss - res.stats.entropy) / res.stats.frames
    assert avgN < avg1 - 0.05, (avg1, avgN)


def test_crossvalidate_does_not_update():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    opts = TrainOptions(learn_rate=0.05, momentum=0.9)
    res = run_epoch(nnet, params, make_sched(), opts, crossvalidate=True)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert res.stats.frames > 0


def test_cv_deterministic_across_runs():
    """Two CV passes over identical data give identical stats (pure
    functional state threading)."""
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    opts = TrainOptions()
    r1 = run_epoch(nnet, params, make_sched(), opts, crossvalidate=True)
    r2 = run_epoch(nnet, params, make_sched(), opts, crossvalidate=True)
    assert r1.stats.loss == r2.stats.loss
    assert r1.stats.correct == r2.stats.correct


def test_grouped_step_matches_plain(tmp_path):
    """step_group > 1 (lax.scan device loop) must reproduce the plain
    per-batch epoch: same final params and the same loss statistics,
    including a tail group smaller than the group size."""
    nnet, params0 = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(3))
    opts = TrainOptions(learn_rate=5e-3, momentum=0.9)

    r_plain = run_epoch(nnet, jax.tree_util.tree_map(jnp.array, params0),
                        make_sched(seed=7), opts)
    r_grp = run_epoch(nnet, jax.tree_util.tree_map(jnp.array, params0),
                      make_sched(seed=7), opts, step_group=3)
    assert r_plain.num_done == r_grp.num_done
    assert r_plain.total_frames == r_grp.total_frames
    assert abs(r_plain.stats.loss - r_grp.stats.loss) \
        <= 1e-3 * max(1.0, abs(r_plain.stats.loss))
    assert r_plain.stats.correct == r_grp.stats.correct
    for a, b in zip(jax.tree_util.tree_leaves(r_plain.params),
                    jax.tree_util.tree_leaves(r_grp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_step_cache_reuses_jit_across_invocations():
    """A recipe process invokes the trainer once per iteration; the
    process-wide step cache must hand back the SAME jit object for a
    freshly re-read net of identical structure (no per-iteration
    re-trace), and distinguish anything that changes the traced
    computation (CV mode, options, structure)."""
    from kaldi_lstm_tpu.train import trainer as tr

    nnet1, _ = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    nnet2, _ = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(1))
    opts = TrainOptions(learn_rate=0.05, momentum=0.9)

    f1 = tr._cached_step("plain", nnet1, opts, None, False,
                         lambda: tr.make_train_step(nnet1, opts))
    f2 = tr._cached_step("plain", nnet2, opts, None, False,
                         lambda: tr.make_train_step(nnet2, opts))
    assert f1 is f2  # same structure -> cached object, zero re-trace

    fcv = tr._cached_step("plain", nnet1, opts, None, True,
                          lambda: tr.make_train_step(nnet1, opts, None,
                                                     True))
    assert fcv is not f1
    opts2 = opts._replace(grad_clip=50.0)
    f3 = tr._cached_step("plain", nnet1, opts2, None, False,
                         lambda: tr.make_train_step(nnet1, opts2))
    assert f3 is not f1

    # learn_rate is a RUNTIME argument of the traced step — a newbob LR
    # halving must HIT the cache, not re-trace (ADVICE r3)
    opts_halved = opts._replace(learn_rate=opts.learn_rate * 0.5)
    f4 = tr._cached_step("plain", nnet1, opts_halved, None, False,
                         lambda: tr.make_train_step(nnet1, opts_halved))
    assert f4 is f1


def test_step_cache_epoch_results_identical():
    """Two epochs through run_epoch (which now consults the cache) give
    bit-identical results to a fresh process' first epoch semantics:
    the cached step is the same computation."""
    nnet, params0 = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(5))
    opts = TrainOptions(learn_rate=5e-3, momentum=0.9)
    r1 = run_epoch(nnet, jax.tree_util.tree_map(jnp.array, params0),
                   make_sched(seed=11), opts)
    # re-read-equivalent: a NEW structurally-equal net object
    nnet_b, _ = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(6))
    r2 = run_epoch(nnet_b, jax.tree_util.tree_map(jnp.array, params0),
                   make_sched(seed=11), opts)
    assert r1.stats.loss == r2.stats.loss
    for a, b in zip(jax.tree_util.tree_leaves(r1.params),
                    jax.tree_util.tree_leaves(r2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_deferred_stats_epoch_identical(monkeypatch):
    """KLT_STATS_DEFER=1 (the transport-bound mode: zero mid-epoch stats
    transfers, one epoch-end fetch) must produce identical params AND
    identical accumulated loss stats to the eager flush path, and a
    non-finite loss must still raise (at epoch end)."""
    nnet, params0 = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(5))
    opts = TrainOptions(learn_rate=5e-3, momentum=0.9)
    r_eager = run_epoch(nnet, jax.tree_util.tree_map(jnp.array, params0),
                        make_sched(seed=13), opts)
    monkeypatch.setenv("KLT_STATS_DEFER", "1")
    r_defer = run_epoch(nnet, jax.tree_util.tree_map(jnp.array, params0),
                        make_sched(seed=13), opts)
    assert r_eager.stats.loss == r_defer.stats.loss
    assert r_eager.stats.correct == r_defer.stats.correct
    assert r_eager.total_frames == r_defer.total_frames
    for a, b in zip(jax.tree_util.tree_leaves(r_eager.params),
                    jax.tree_util.tree_leaves(r_defer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # grouped epoch too (the production TPU configuration)
    monkeypatch.delenv("KLT_STATS_DEFER")
    r_eg = run_epoch(nnet, jax.tree_util.tree_map(jnp.array, params0),
                     make_sched(seed=14), opts, step_group=3)
    monkeypatch.setenv("KLT_STATS_DEFER", "1")
    r_dg = run_epoch(nnet, jax.tree_util.tree_map(jnp.array, params0),
                     make_sched(seed=14), opts, step_group=3)
    assert r_eg.stats.loss == r_dg.stats.loss
    assert r_eg.total_frames == r_dg.total_frames

    # non-finite guard still fires (epoch-end in deferred mode)
    import pytest as _pytest
    with _pytest.raises(FloatingPointError):
        run_epoch(nnet, jax.tree_util.tree_map(jnp.array, params0),
                  make_sched(seed=15), TrainOptions(learn_rate=1e9))


def test_jitted_monitor_matches_eager_reference():
    """The one-dispatch device monitor must reproduce the moments the
    old eager implementation computed: per-activation, per-grad-leaf,
    and per-component backprop-buffer statistics."""
    from kaldi_lstm_tpu.models.components import Softmax
    from kaldi_lstm_tpu.train import trainer as tr
    from kaldi_lstm_tpu.train.loss import masked_xent_loss

    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(2))
    S, T = 2, 5
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(S, T, 6).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 5, (S, T, 1)).astype(np.int32))
    w = jnp.ones((S, T, 1), np.float32)
    mask = jnp.ones((S, T), np.float32)
    states = nnet.init_states(S)

    mon = tr.make_monitor_fn(nnet, TrainOptions(), None, False)
    packed = mon(params, (), x, states, ids, w, mask)
    # contract: ONE stacked [N, 4] device array per call — a single D2H
    # transfer on the tunnel (ADVICE r3), not a pytree of tiny arrays
    assert isinstance(packed, jax.Array) and packed.ndim == 2 \
        and packed.shape[1] == 4
    packed = np.asarray(packed)
    n_act = len(nnet.components) + 1
    treedef = jax.tree_util.tree_structure(params)
    act_m = list(packed[:n_act])
    grad_m = jax.tree_util.tree_unflatten(
        treedef, list(packed[n_act:n_act + treedef.num_leaves]))
    bp_m = list(packed[n_act + treedef.num_leaves:])

    # eager reference: forward chain
    acts = [x]
    a = x
    for c, p, s in zip(nnet.components, params, states):
        a, _ = c.apply(p, a, s)
        acts.append(a)
    for m, a in zip(act_m, acts):
        a = np.asarray(a)
        np.testing.assert_allclose(
            m, [a.min(), a.max(), a.mean(), a.std()], rtol=1e-5, atol=1e-6)

    def objective(p):
        logits, _ = nnet.propagate(p, x, states, logits=True)
        return masked_xent_loss(logits, ids, w, mask)[0]

    grads = jax.grad(objective)(params)
    for g, m in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(grad_m)):
        g = np.asarray(g)
        np.testing.assert_allclose(
            m, [g.min(), g.max(), g.mean(), g.std()], rtol=1e-4, atol=1e-6)

    # backprop buffers: eager d loss / d acts[i] via sub-stack re-forward
    comps = nnet.components
    n_bp = len(comps) - (1 if isinstance(comps[-1], Softmax) else 0)
    for i in range(n_bp):
        def from_here(a):
            y = a
            for c, p, s in zip(comps[i:], params[i:], states[i:]):
                if isinstance(c, Softmax) and c is comps[-1]:
                    break
                y, _ = c.apply(p, y, s)
            return masked_xent_loss(y, ids, w, mask)[0]

        g = np.asarray(jax.grad(from_here)(acts[i]))
        np.testing.assert_allclose(
            bp_m[i], [g.min(), g.max(), g.mean(), g.std()],
            rtol=1e-4, atol=1e-6)


def test_monitor_every_25k_frames_at_vlog2(capsys):
    """Reference :251-260: at verbose>=2 the moment dumps repeat every
    25k masked frames (here: shrunk by feeding >25k frames)."""
    import kaldi_lstm_tpu.utils.logging as klog

    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    # ~60 utts x ~12 frames = 720 frames < 25k: use a tiny threshold by
    # feeding the real one many batches? Instead simply verify the
    # trigger arithmetic via a long synthetic pass with 30k frames.
    utts, targets = synth_utts(n=8, seed=3)
    big = []
    for r in range(300):  # 300 x ~100 frames/utt-set ~ 30k frames total
        big.extend((f"r{r}_{k}", f) for k, f in utts)
        for k, f in utts:
            targets.table[f"r{r}_{k}"] = targets.table[k]
    sched = StreamScheduler(iter(big), targets, feat_dim=6,
                            num_stream=4, batch_size=20, targets_delay=0)
    klog.set_verbose_level(2)
    try:
        run_epoch(nnet, params, sched, TrainOptions(learn_rate=1e-3),
                  monitor_verbose=2)
    finally:
        klog.set_verbose_level(0)
    err = capsys.readouterr().err
    assert "### After 0 frames," in err
    import re
    repeats = re.findall(r"### After (\d+) frames,", err)
    assert any(int(n) >= 25000 for n in repeats), repeats


def test_tunnel_backend_detection(monkeypatch):
    """The tunnel plugin registers as backend 'tpu', so detection keys
    on PALLAS_AXON_POOL_IPS + non-CPU backend; plain CPU runs (tests)
    must NOT defer even with the env var set."""
    from kaldi_lstm_tpu.train import trainer as tr
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert tr._on_tunnel_backend() is False  # cpu backend, no env
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    # backend is cpu in the test env -> still False
    assert tr._on_tunnel_backend() is False
    monkeypatch.setenv("KLT_STATS_DEFER", "1")
    assert tr._stats_defer_default() is True
    monkeypatch.setenv("KLT_STATS_DEFER", "0")
    assert tr._stats_defer_default() is False


def test_fetch_tree_host_single_transfer_and_dtypes():
    """fetch_tree_host: float trees come back with original dtypes and
    shapes (one-transfer path); int leaves fall back to device_get."""
    from kaldi_lstm_tpu.train.checkpoint import fetch_tree_host
    t = {"a": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3),
         "b": jnp.ones((4,), jnp.float32) * 1.5,
         "c": jnp.float32(2.5)}
    out = fetch_tree_host(t)
    assert np.asarray(out["a"]).dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out["a"], np.float32),
                                  np.arange(6).reshape(2, 3))
    np.testing.assert_array_equal(out["b"], np.full(4, 1.5, np.float32))
    assert float(out["c"]) == 2.5
    mixed = {"i": jnp.arange(3, dtype=jnp.int32)}
    np.testing.assert_array_equal(fetch_tree_host(mixed)["i"],
                                  np.arange(3, dtype=np.int32))
