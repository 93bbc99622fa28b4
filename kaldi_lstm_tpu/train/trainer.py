"""The jit'd training step and the epoch driver.

One compiled function per epoch:

    (params, opt_state, carry_states, batch, learn_rate)
        -> (params', opt_state', carry_states', stats)

covering what the reference does imperatively per minibatch
(bd-nnet-train-lstm-streams.cc:209-229): per-stream state reset (mask
multiply *before* the chunk), feature transform, forward, masked loss,
BPTT via jax.grad, and the SGD+momentum update — all fused by XLA into a
single device program. `learn_rate` is a traced scalar so the recipe's LR
halving never recompiles.

The epoch driver (`run_epoch`) adds the host side: the stream scheduler,
progressive logging, fps reporting, and periodic model dumps
(:232-281).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models.nnet import Nnet
from kaldi_lstm_tpu.train.loss import (
    LossAux,
    LossStats,
    masked_mse_loss,
    masked_xent_loss,
)
from kaldi_lstm_tpu.train.optim import (
    MomentumState,
    init_momentum,
    momentum_update,
)
from kaldi_lstm_tpu.train.streams import StreamBatch, StreamScheduler
from kaldi_lstm_tpu.utils import LOG, VLOG, Timer


class TrainOptions(NamedTuple):
    """NnetTrainOptions equivalent (nnet-trnopts.h upstream)."""
    learn_rate: float = 1e-5
    momentum: float = 0.9
    grad_clip: float = 0.0    # 50.0 reproduces the standard variant
    l1_penalty: float = 0.0   # upstream --l1-penalty (affine linearity)
    l2_penalty: float = 0.0   # upstream --l2-penalty (affine linearity)
    objective: str = "xent"   # xent | mse
    # fuse the senone AffineTransform+Softmax+xent into one Pallas kernel
    # (logits never materialized; requires the net to end with
    # [AffineTransform, Softmax] and objective == xent).
    # None = auto: on when running on TPU (measured faster at both 8k and
    # 16.6k senones); True/False forces.
    fused_xent: Optional[bool] = None


def _tail_is_affine_softmax(nnet: Nnet) -> bool:
    from kaldi_lstm_tpu.models.components import AffineTransform, Softmax
    return (len(nnet.components) >= 2
            and isinstance(nnet.components[-2], AffineTransform)
            and isinstance(nnet.components[-1], Softmax))


_LOSS_FNS = {"xent": masked_xent_loss, "mse": masked_mse_loss}


def trunk_supports_time_major(nnet: Nnet) -> bool:
    """True when every component before the [Affine, Softmax] tail either
    ignores the [S, T] axis order (elementwise) or accepts
    time_major=True (the LSTMs)."""
    return all(getattr(c, "axis_invariant", False)
               or getattr(c, "supports_time_major", False)
               for c in nnet.components[:-2])


def make_objective(nnet: Nnet, loss_fn, use_fused: bool, fused_fn,
                   train: bool, time_major: bool = False,
                   want_logits: bool = True):
    """Objective builder shared by the single-chip and sharded steps.

    Returns objective(params, x, states, tgt_ids, tgt_weights, mask, rng)
    -> (loss, (aux, new_states)). With `use_fused`, runs the stack up to
    the senone affine and hands the [N, R] frames to `fused_fn(r, w, b,
    ids, tw, mask)` (the fused affine+softmax+xent kernel, single-chip or
    tensor-parallel) instead of materializing logits.

    With `time_major` (fused only), the batch is transposed to [T, S, .]
    once at entry — features, ids, weights and mask are all small — and
    the whole trunk runs in the LSTM kernels' native layout, eliminating
    the [T*S, 4C/R]-sized transposes (~25% of the step at S=512). The
    loss is a frame sum, so the flattening order is immaterial."""

    def objective(params, x, states, tgt_ids, tgt_weights, mask, rng):
        if use_fused:
            tm = time_major
            y = x.swapaxes(0, 1) if tm else x
            new_states = []
            for i, (c, p, s) in enumerate(
                    zip(nnet.components[:-2], params[:-2], states)):
                kwargs = {}
                if tm and getattr(c, "supports_time_major", False):
                    kwargs["time_major"] = True
                if (train
                        and getattr(c, "accepts_input_grad_flag", False)
                        and not any(getattr(cc, "updatable", False)
                                    for cc in nnet.components[:i])):
                    # nothing trainable below this layer: its input grad
                    # is discarded — skip the dx GEMM in the backward
                    kwargs["input_grad"] = False
                if getattr(c, "uses_rng", False):
                    crng = None if rng is None else \
                        jax.random.fold_in(rng, i)
                    y, s2 = c.apply(p, y, s, rng=crng, train=train,
                                    **kwargs)
                else:
                    y, s2 = c.apply(p, y, s, **kwargs)
                new_states.append(s2)
            new_states += [None, None]
            n = y.shape[0] * y.shape[1]
            aff = params[-2]
            ids_f = (tgt_ids.swapaxes(0, 1) if tm else tgt_ids)
            tw_f = (tgt_weights.swapaxes(0, 1) if tm else tgt_weights)
            mask_f = (mask.swapaxes(0, 1) if tm else mask)
            loss, aux = fused_fn(
                y.reshape(n, y.shape[2]), aff["linearity"], aff["bias"],
                ids_f.reshape(n, -1), tw_f.reshape(n, -1),
                mask_f.reshape(n))
            return loss, (aux, tuple(new_states))
        # xent consumes pre-softmax logits (jax.grad = combined
        # softmax+xent backward); mse consumes the net output as-is
        # (upstream Mse::EvalMasked, nnet-loss.cc:374-436)
        logits, new_states = nnet.propagate(params, x, states,
                                            logits=want_logits,
                                            rng=rng, train=train)
        loss, aux = loss_fn(logits, tgt_ids, tgt_weights, mask)
        return loss, (aux, new_states)

    return objective


def build_lr_scale(nnet: Nnet, params):
    """Per-leaf learn-rate multipliers from component config — nnet1's
    <LearnRateCoef>/<BiasLearnRateCoef> (0 freezes a tensor)."""
    from kaldi_lstm_tpu.models.components import AffineTransform
    out = []
    for c, p in zip(nnet.components, params):
        if isinstance(c, AffineTransform):
            out.append({"linearity": float(c.learn_rate_coef),
                        "bias": float(c.bias_learn_rate_coef)})
        else:
            coef = float(getattr(c, "learn_rate_coef", 1.0))
            out.append(jax.tree_util.tree_map(lambda _: coef, p))
    return tuple(out)


def build_reg_mask(nnet: Nnet, params):
    """Per-leaf 0/1 markers for where nnet1 applies --l1/--l2-penalty:
    only AffineTransform linearity (nnet-affine-transform.h Update; the
    reference LSTM component's Update has no regularization)."""
    from kaldi_lstm_tpu.models.components import AffineTransform
    out = []
    for c, p in zip(nnet.components, params):
        if isinstance(c, AffineTransform):
            out.append({"linearity": 1.0, "bias": 0.0})
        else:
            out.append(jax.tree_util.tree_map(lambda _: 0.0, p))
    return tuple(out)


def apply_max_norm(nnet: Nnet, params):
    """Per-neuron max-norm projection after the weight update: rows of an
    AffineTransform's linearity whose L2 norm exceeds <MaxNorm> are shrunk
    back onto the sphere (upstream nnet1 AffineTransform::Update; the
    reference carries the same idea commented out for the LSTM weights at
    bd-nnet-lstm-projected-streams.h:534-574). No-op for max_norm == 0."""
    from kaldi_lstm_tpu.models.components import AffineTransform
    new = list(params)
    for i, c in enumerate(nnet.components):
        mn = float(getattr(c, "max_norm", 0.0) or 0.0)
        if isinstance(c, AffineTransform) and mn > 0.0:
            w = new[i]["linearity"]
            l2 = jnp.sqrt(jnp.sum(w * w, axis=1, keepdims=True))
            new[i] = {**new[i],
                      "linearity": w / jnp.maximum(l2 / mn, 1.0)}
    return tuple(new)


def nnet_has_max_norm(nnet: Nnet) -> bool:
    return any(float(getattr(c, "max_norm", 0.0) or 0.0) > 0.0
               for c in nnet.components)


def default_use_fused(nnet: Nnet, opts: TrainOptions) -> bool:
    from kaldi_lstm_tpu.models.components import _on_tpu
    fused_wanted = (_on_tpu() if opts.fused_xent is None
                    else opts.fused_xent)
    return (fused_wanted and opts.objective == "xent"
            and _tail_is_affine_softmax(nnet))


def _make_step_fn(nnet: Nnet, opts: TrainOptions,
                  transf: Optional[Nnet], crossvalidate: bool,
                  use_fused: Optional[bool] = None, fused_fn=None,
                  time_major: Optional[bool] = None):
    """The un-jitted single-step computation shared by the plain,
    grouped, and sharded (parallel/sharded_trainer.py) train steps.
    `use_fused`/`fused_fn`/`time_major` override the single-chip
    defaults — the sharded step passes the tensor-parallel fused kernel
    and disables the time-major layout."""
    loss_fn = _LOSS_FNS[opts.objective]
    if use_fused is None:
        use_fused = default_use_fused(nnet, opts)
    if fused_fn is None:
        from kaldi_lstm_tpu.ops.xent_pallas import masked_xent_affine
        fused_fn = masked_xent_affine
    if time_major is None:
        time_major = use_fused and trunk_supports_time_major(nnet)
    objective_fn = make_objective(
        nnet, loss_fn, use_fused, fused_fn,
        train=not crossvalidate, time_major=time_major,
        want_logits=opts.objective == "xent")

    def step(params, opt_state, states, transf_params, feats, tgt_ids,
             tgt_weights, mask, reset_flags, learn_rate, rng=None):
        states = nnet.reset_states(states, reset_flags)
        x = feats
        if transf is not None:
            x = transf.feedforward(transf_params, x)

        def objective(params):
            return objective_fn(params, x, states, tgt_ids, tgt_weights,
                                mask, rng)

        if crossvalidate:
            _, (aux, new_states) = objective(params)
            return params, opt_state, new_states, aux

        (_, (aux, new_states)), grads = jax.value_and_grad(
            objective, has_aux=True)(params)
        # A fully-masked FILLER batch (SyncedScheduler lock-step padding,
        # parallel/multihost.py) must be an exact no-op on the params:
        # its grads are identically zero, but a plain update would still
        # decay the momentum buffer (corr = mmt*corr; w -= lr*corr).
        # Guard with scalars — lr 0 and momentum 1 make corr and params
        # carry through unchanged, at zero tensor cost.
        real = aux.frames > 0
        lr_eff = learn_rate * real.astype(jnp.float32)
        mmt_eff = jnp.where(real, opts.momentum, 1.0)
        params, opt_state = momentum_update(
            params, grads, opt_state, lr_eff, mmt_eff,
            opts.grad_clip, lr_scale=build_lr_scale(nnet, params),
            l1_penalty=opts.l1_penalty, l2_penalty=opts.l2_penalty,
            num_frames=feats.shape[0] * feats.shape[1],
            reg_mask=build_reg_mask(nnet, params))
        if nnet_has_max_norm(nnet):
            params = apply_max_norm(nnet, params)
        return params, opt_state, new_states, aux

    return step


def make_train_step(nnet: Nnet, opts: TrainOptions,
                    transf: Optional[Nnet] = None,
                    crossvalidate: bool = False):
    """Build the jit'd step. `transf` is the feature-transform net (CMVN);
    its params are passed per call (they are small and frozen)."""
    # donate params/opt_state/states buffers in training (they are consumed
    # and re-emitted every step); CV must not donate — callers keep reading
    # the same params across the pass
    donate = () if crossvalidate else (0, 1, 2)
    return functools.partial(jax.jit, donate_argnums=donate)(
        _make_step_fn(nnet, opts, transf, crossvalidate))


def make_grouped_train_step(nnet: Nnet, opts: TrainOptions,
                            transf: Optional[Nnet] = None,
                            crossvalidate: bool = False):
    """One device dispatch runs a GROUP of train steps via lax.scan over
    pre-staged batches (leading axis B on every batch array; rngs is an
    optional [B, 2] key array for dropout). Per-step dispatch through a
    device queue costs ~25% of wall at the flagship shape (BENCH_NOTES
    device-attribution); grouping amortizes it — the TPU-idiomatic
    device-loop the reference's per-minibatch host loop
    (bd-nnet-train-lstm-streams.cc:143-282) could never express.
    Returns stacked per-step aux ([B]-shaped LossAux). `crossvalidate`
    groups the CV pass the same way (params pass through the scan
    unchanged) — a CV epoch is otherwise per-dispatch-latency-bound."""
    step_fn = _make_step_fn(nnet, opts, transf, crossvalidate)

    @functools.partial(jax.jit,
                       donate_argnums=() if crossvalidate else (0, 1, 2))
    def gstep(params, opt_state, states, transf_params, feats, tgt_ids,
              tgt_weights, mask, reset_flags, learn_rate, rngs=None):
        def body(carry, xs):
            p, o, s = carry
            rng = xs[-1] if rngs is not None else None
            f, i, w, m, fl = xs[:5]
            p, o, s, aux = step_fn(p, o, s, transf_params, f, i, w, m,
                                   fl, learn_rate, rng)
            return (p, o, s), aux

        xs = (feats, tgt_ids, tgt_weights, mask, reset_flags)
        if rngs is not None:
            xs = xs + (rngs,)
        (params, opt_state, states), auxs = jax.lax.scan(
            body, (params, opt_state, states), xs)
        return params, opt_state, states, auxs

    return gstep


# --- process-wide step-function cache -------------------------------------
# A recipe run invokes the trainer CLI dozens of times in one process (a
# train + a CV epoch per newbob iteration, tools/run_recipe.py); each call
# used to rebuild its jax.jit wrapper, so EVERY epoch re-traced the step
# and re-fetched the compiled executable from the compilation cache —
# seconds per iteration at flagship scale, and the dominant term of the
# host-side gap on the axon tunnel (VERDICT r2 item 3). Components hold
# only static config (dims, clips, rates), so a structural signature of
# the net keys a cache of the jitted steps; params/state are per-call
# arguments and never enter the closure's identity.

def _component_sig(c) -> tuple:
    items = []
    for k, v in sorted(vars(c).items()):
        items.append((k, v if isinstance(
            v, (bool, int, float, str, type(None))) else repr(v)))
    return (type(c).__name__, tuple(items))


def _nnet_sig(nnet: Optional[Nnet]):
    if nnet is None:
        return None
    return tuple(_component_sig(c) for c in nnet.components)


_STEP_CACHE: dict = {}


def _cached_step(kind: str, nnet: Nnet, opts: TrainOptions,
                 transf: Optional[Nnet], crossvalidate: bool,
                 build, extra=()):
    """kind: 'plain' | 'group' | 'sharded' | 'sharded_group'. The key
    captures everything the traced computation depends on besides the
    per-call arrays: net/transform structure, options, CV mode, the
    global matmul dtype, and (sharded) the mesh layout + stream count
    via `extra`. `build()` constructs the step on a miss."""
    from kaldi_lstm_tpu.models.components import get_matmul_dtype
    # learn_rate is a RUNTIME argument of the traced step (lr_eff =
    # learn_rate * real), never a trace constant — normalize it out of
    # the key so newbob LR halvings hit the cache instead of re-tracing
    # every iteration (ADVICE r3).
    key = (kind, _nnet_sig(nnet), _nnet_sig(transf),
           opts._replace(learn_rate=0.0),
           bool(crossvalidate), str(get_matmul_dtype()), extra)
    fn = _STEP_CACHE.get(key)
    if fn is None:
        fn = _STEP_CACHE[key] = build()
    return fn


def _moms4(a):
    """[min, max, mean, std] of a tensor as one tiny device array."""
    a32 = a.astype(jnp.float32)
    return jnp.stack([jnp.min(a32), jnp.max(a32), jnp.mean(a32),
                      jnp.std(a32)])


def make_monitor_fn(nnet: Nnet, opts: TrainOptions,
                    transf: Optional[Nnet], crossvalidate: bool):
    """First-minibatch introspection as ONE jitted device call
    (reference :232-239 InfoPropagate/InfoGradient/InfoBackPropagate).
    The naive route — eager per-component forwards with a full D2H
    fetch of every activation/grad buffer — costs minutes per recipe
    iteration on a tunneled device ([S,T,K] senone activations are
    hundreds of MB); instead every moment is reduced ON DEVICE and only
    4 floats per buffer come back. Backprop buffers (d loss / d input
    of each component) come from one cotangent chain over per-component
    vjps — not the O(n^2) re-forward of a naive implementation."""
    from kaldi_lstm_tpu.models.components import Softmax
    loss_fn = _LOSS_FNS[opts.objective]
    comps = nnet.components
    # combined softmax+xent: the diff enters at the logits
    n_bp = len(comps) - (1 if isinstance(comps[-1], Softmax) else 0)

    @jax.jit
    def monitor(params, transf_params, x, states, ids, w, mask):
        if transf is not None:
            x = transf.feedforward(transf_params, x)
        acts = [x]
        vjps = []
        a = x
        for c, p, s in zip(comps, params, states):
            a, vjp = jax.vjp(
                lambda t, _c=c, _p=p, _s=s: _c.apply(_p, t, _s)[0], a)
            acts.append(a)
            vjps.append(vjp)
        # ONE stacked [N, 4] result (activation rows, then flattened
        # grad-leaf rows, then backprop rows): the tunnel costs ~30 s of
        # D2H synchronization PER SMALL ARRAY fetched (CLAUDE.md), so a
        # pytree of 25-60 tiny [4] results would cost minutes per dump
        # (ADVICE r3); a single transfer is device-bound.
        rows = [_moms4(t) for t in acts]
        if crossvalidate:
            return jnp.stack(rows)

        def objective(p):
            logits, _ = nnet.propagate(p, acts[0], states, logits=True)
            return loss_fn(logits, ids, w, mask)[0]

        grad_m = jax.tree_util.tree_map(_moms4, jax.grad(objective)(params))
        rows += jax.tree_util.tree_leaves(grad_m)

        cot = jax.grad(lambda y: loss_fn(y, ids, w, mask)[0])(acts[n_bp])
        bp_m = [None] * n_bp
        for i in range(n_bp - 1, -1, -1):
            cot = vjps[i](cot)[0]  # d loss / d acts[i] = input of comp i
            bp_m[i] = _moms4(cot)
        return jnp.stack(rows + bp_m)

    return monitor


def _monitor_first_batch(nnet, params, transf, transf_params, batch, opts,
                         crossvalidate, total_frames: int = 0,
                         level: int = 1):
    """Format and VLOG the moment dumps from the cached jitted monitor
    (reference :232-239 output layout at the first minibatch; :251-260
    every-25k-frames repeat at vlog-2, `level=2`)."""
    from kaldi_lstm_tpu.models.components import Moments, moment_statistics
    monitor = _cached_step(
        "monitor", nnet, opts, transf, crossvalidate,
        lambda: make_monitor_fn(nnet, opts, transf, crossvalidate))
    S, T = batch.feats.shape[:2]
    states = nnet.init_states(S)
    # the monitor returns ONE [N, 4] device array; fetch it with a
    # single transfer and split on host (row layout: activations,
    # flattened grad leaves, backprop diffs — see make_monitor_fn)
    packed = np.asarray(monitor(
        params, transf_params, jnp.asarray(batch.feats), states,
        jnp.asarray(batch.tgt_ids), jnp.asarray(batch.tgt_weights),
        jnp.asarray(batch.mask)))
    n_act = len(nnet.components) + 1
    act_m = list(packed[:n_act])
    grad_m = bp_m = None
    if not crossvalidate:
        treedef = jax.tree_util.tree_structure(params)
        n_grad = treedef.num_leaves
        grad_m = jax.tree_util.tree_unflatten(
            treedef, list(packed[n_act:n_act + n_grad]))
        bp_m = list(packed[n_act + n_grad:])

    def stat(name, dim, m):
        return "  " + moment_statistics(
            name, Moments((S, T, dim), m[0], m[1], m[2], m[3]))

    comps = nnet.components
    in_dim = transf.output_dim if transf is not None else nnet.input_dim
    lines = ["### Forward propagation buffer content :",
             stat("[input]", in_dim, act_m[0])]
    for c, m in zip(comps, act_m[1:]):
        lines.append(stat(f"[output of {c.token[1:-1]}]", c.output_dim, m))
    VLOG(level, f"### After {total_frames} frames,")
    VLOG(level, "\n".join(lines))
    if crossvalidate:
        return

    mom_tree = jax.tree_util.tree_map(
        lambda p, m: Moments(jnp.shape(p), m[0], m[1], m[2], m[3]),
        params, grad_m)
    VLOG(level, nnet.info_gradient(mom_tree))
    lines = ["### Backward propagation buffer content :"]
    for c, m in zip(comps, bp_m):
        lines.append(stat(f"[diff at input of {c.token[1:-1]}]",
                          c.input_dim, m))
    VLOG(level, "\n".join(lines))


def _staging_thread_ok() -> bool:
    """Whether H2D staging may run on a background thread.
    KLT_STAGING_THREAD=1/0 forces; default is on EXCEPT when the
    backend NAME is 'axon' (an early tunnel client wedged under a
    device_put concurrent with dispatch). NOTE: the current tunnel
    plugin registers as 'tpu', so staging has effectively been ON for
    every round-3/4 recipe run without incident (2.8 s flagship passes
    with stage+H2D overlapped) — the check is kept only for the older
    backend name."""
    import os
    v = os.environ.get("KLT_STAGING_THREAD", "")
    if v in ("0", "1"):
        return v == "1"
    try:
        return jax.default_backend() != "axon"
    except Exception:
        return True


class EpochResult(NamedTuple):
    params: Any
    opt_state: MomentumState
    stats: LossStats
    num_done: int
    total_frames: int
    elapsed: float


def run_epoch(nnet: Nnet, params, scheduler: StreamScheduler,
              opts: TrainOptions,
              transf: Optional[Nnet] = None, transf_params=(),
              crossvalidate: bool = False,
              opt_state: Optional[MomentumState] = None,
              dump_interval: int = 0, dump_fn=None,
              learn_rate: Optional[float] = None,
              monitor_verbose: int = 0,
              step_group: int = 1,
              plan=None, sync_every: int = 1) -> EpochResult:
    """One pass over the utterance source (one `bd-nnet-train-lstm-streams`
    invocation). `dump_fn(params, num_done)` is called every
    `dump_interval` utterances (:275-281). `monitor_verbose>=1` prints
    InfoPropagate/InfoGradient moment dumps at the first minibatch
    (:232-239). `step_group > 1` stages that many batches per device
    dispatch (lax.scan device loop — identical math, coarser
    dump/monitor granularity); group tails run through the plain step.

    `plan` (a parallel.MeshPlan) switches the epoch to the SHARDED steps:
    streams over the mesh 'data' axis, senone layer over 'model', batches
    placed by shard_batch_to_mesh. The scheduler is wrapped in a
    SyncedScheduler (continue-flag agreement every `sync_every` steps) so
    multi-host runs execute identical collective step counts; on a
    multi-process run each host feeds its local scheduler shard and the
    returned params/opt_state stay sharded (gather via
    plan.gather_params before writing). With multiple processes the
    dump trigger counts global steps (deterministic across hosts — a
    local-utterance trigger could fire the collective gather on one host
    only) and first-batch monitoring is skipped."""
    use_group = step_group > 1
    multiproc = False
    if plan is not None:
        from kaldi_lstm_tpu.parallel.multihost import (
            SyncedScheduler,
            shard_batch_to_mesh,
            shard_group_to_mesh,
        )
        from kaldi_lstm_tpu.parallel.sharded_trainer import (
            make_sharded_grouped_train_step,
            make_sharded_train_step,
        )
        multiproc = jax.process_count() > 1
        if not isinstance(scheduler, SyncedScheduler):
            scheduler = SyncedScheduler(scheduler,
                                        agree_every=max(1, sync_every))
        S_global = scheduler.S * jax.process_count()
        states_example = nnet.init_states(S_global)
        mesh_sig = (tuple(zip(plan.mesh.axis_names,
                              plan.mesh.devices.shape)), S_global)

        def _mk_plain_step():
            return _cached_step(
                "sharded", nnet, opts, transf, crossvalidate,
                lambda: make_sharded_train_step(
                    nnet, opts, plan, transf, crossvalidate,
                    params_example=params, states_example=states_example,
                    transf_params_example=transf_params),
                extra=mesh_sig)

        step = None if use_group else _mk_plain_step()
        gstep = _cached_step(
            "sharded_group", nnet, opts, transf, crossvalidate,
            lambda: make_sharded_grouped_train_step(
                nnet, opts, plan, transf, crossvalidate,
                params_example=params, states_example=states_example,
                transf_params_example=transf_params),
            extra=mesh_sig) if use_group else None
        if opt_state is None:
            opt_state = init_momentum(params)
        params = plan.place_params(params)
        opt_state = plan.place_opt(opt_state)
        states = plan.place_states(states_example)
        # transf params must be GLOBAL arrays on multi-process (a plain
        # device-local jax.Array is rejected by the multi-controller jit)
        transf_params = jax.tree_util.tree_map(
            lambda a: plan._put(np.asarray(a), plan.replicated()),
            transf_params)
        if monitor_verbose >= 1 and multiproc:
            monitor_verbose = 0
    else:
        def _mk_plain_step():
            return _cached_step(
                "plain", nnet, opts, transf, crossvalidate,
                lambda: make_train_step(nnet, opts, transf, crossvalidate))

        step = None if use_group else _mk_plain_step()
        gstep = _cached_step(
            "group", nnet, opts, transf, crossvalidate,
            lambda: make_grouped_train_step(nnet, opts, transf,
                                            crossvalidate)) \
            if use_group else None
        if opt_state is None:
            opt_state = init_momentum(params)
        states = nnet.init_states(scheduler.S)
    lr = jnp.float32(opts.learn_rate if learn_rate is None else learn_rate)

    stats = LossStats("Xent" if opts.objective == "xent" else "Mse")
    timer = Timer()
    total_frames = 0
    last_report_done = 0
    last_dump_done = 0
    first_batch = True
    monitor_frames = 0  # host-side masked-frame count (:241 semantics)
    use_dropout = (not crossvalidate and any(
        getattr(c, "dropout_rate", 0.0) > 0 for c in nnet.components))
    drop_key = jax.random.PRNGKey(777)
    batch_idx = 0
    pending: list = []       # jit-packed [n, 4] per-step stat blocks
    # transport-bound backends: park concatenated blocks here and fetch
    # ONCE at epoch end (VERDICT r3 weak #4 — the serial stats tail)
    defer = _stats_defer_default()
    deferred: Optional[list] = [] if defer else None
    # deferred mode: still force ONE fetch + non-finite health check per
    # KLT_HEALTH_INTERVAL utterances (ADVICE r4: a diverged run should
    # die within the interval, not burn the rest of the epoch — the
    # reference checks health every 1000 utterances, :269-272; one
    # transfer per interval is the bounded cost)
    import os as _os_env
    health_interval = int(_os_env.environ.get("KLT_HEALTH_INTERVAL",
                                              "5000"))
    last_health_done = 0

    def batched_source():
        """Yield lists of up to `step_group` StreamBatches."""
        from kaldi_lstm_tpu.train.streams import PrefetchIterator
        if multiproc:
            # the SyncedScheduler's continue-flag allgather is a
            # collective — it must interleave deterministically with the
            # pjit steps, so no background prefetch thread here
            it = scheduler
        else:
            it = PrefetchIterator(scheduler,
                                  depth=max(2, step_group + 1))
        group: list = []
        for b in it:
            group.append(b)
            if len(group) >= max(step_group, 1):
                yield group
                group = []
        if group:
            yield group

    if plan is not None:
        def place_one(b: StreamBatch):
            from kaldi_lstm_tpu.parallel.multihost import \
                shard_batch_to_mesh
            return shard_batch_to_mesh(plan, b)

        def place_group(group):
            from kaldi_lstm_tpu.parallel.multihost import \
                shard_group_to_mesh
            return shard_group_to_mesh(plan, group)
    else:
        def place_one(b: StreamBatch):
            return (jnp.asarray(b.feats), jnp.asarray(b.tgt_ids),
                    jnp.asarray(b.tgt_weights), jnp.asarray(b.mask),
                    jnp.asarray(b.reset_flags))

        def place_group(group):
            return (jnp.asarray(np.stack([g.feats for g in group])),
                    jnp.asarray(np.stack([g.tgt_ids for g in group])),
                    jnp.asarray(np.stack([g.tgt_weights for g in group])),
                    jnp.asarray(np.stack([g.mask for g in group])),
                    jnp.asarray(np.stack([g.reset_flags
                                          for g in group])))

    # utterances CONSUMED by trained batches — scheduler.num_done runs
    # ahead of training by up to the prefetch depth (the background
    # thread feeds utterances into queued batches); reports and dump
    # names must count processed work (reference :263-281 semantics)
    consumed_done = 0

    # per-stage wall attribution (VERDICT r2 item 3): `stage` is the
    # host stacking + H2D placement (overlapped with device compute on
    # single-process runs -- see staged_source), `wait` is main-thread
    # starvation on the staged pipeline, `dispatch` is the step-call time
    # (device-queue backpressure + donation sync), `stats` the blocking
    # aux fetches. Logged at epoch end under KLT_EPOCH_PROFILE=1 or -v 2.
    import time as _time
    prof = {"stage": 0.0, "wait": 0.0, "dispatch": 0.0, "stats": 0.0}

    def staged_source():
        """Attach device placement to each group: (group, kind, staged)
        with kind 'g' (one grouped dispatch) or 's' (per-batch steps)."""
        for group in batched_source():
            t0 = _time.perf_counter()
            if use_group and len(group) == step_group:
                item = (group, "g", place_group(group))
            else:
                item = (group, "s", [place_one(b) for b in group])
            prof["stage"] += _time.perf_counter() - t0
            yield item

    serialize_steps = (plan is not None
                       and jax.default_backend() == "cpu"
                       and len(jax.devices()) > 1)

    src = staged_source()
    if not multiproc and _staging_thread_ok():
        # second pipeline stage: np.stack + H2D upload runs on its own
        # thread so device compute never waits on staging (the scheduler
        # already prefetches on a first thread inside batched_source)
        from kaldi_lstm_tpu.train.streams import PrefetchIterator
        src = PrefetchIterator(src, depth=2)
    src_it = iter(src)

    while True:
        t0 = _time.perf_counter()
        item = next(src_it, None)
        prof["wait"] += _time.perf_counter() - t0
        if item is None:
            break
        group, kind, staged = item
        if first_batch and monitor_verbose >= 1:
            _monitor_first_batch(nnet, params, transf, transf_params,
                                 group[0], opts, crossvalidate)
        first_batch = False
        prev_monitor_frames = monitor_frames
        monitor_frames += sum(int(g.mask.sum()) for g in group)
        consumed_done += sum(g.num_new_utts for g in group)
        t0 = _time.perf_counter()
        if kind == "g":
            b = len(group)
            gargs = (params, opt_state, states, transf_params) \
                + staged + (lr,)
            if use_dropout:
                rngs = jnp.stack([jax.random.fold_in(drop_key,
                                                     batch_idx + i)
                                  for i in range(b)])
                params, opt_state, states, aux = gstep(*gargs, rngs=rngs)
            else:
                params, opt_state, states, aux = gstep(*gargs)
            batch_idx += b
            pending.append(_pack_aux(aux))  # [B, 4] device block
        else:
            for placed in staged:
                step_args = (params, opt_state, states, transf_params) \
                    + placed + (lr,)
                if step is None:  # grouped epoch's tail
                    step = _mk_plain_step()
                if use_dropout:
                    params, opt_state, states, aux = step(
                        *step_args,
                        rng=jax.random.fold_in(drop_key, batch_idx))
                else:
                    params, opt_state, states, aux = step(*step_args)
                batch_idx += 1
                # Buffer per-batch stats on DEVICE and fetch in blocks:
                # a per-step host transfer would serialize the pipeline
                # (the reference syncs every minibatch -- cheap on its
                # single GPU, ruinous through a device queue at hundreds
                # of steps/s).
                pending.append(_pack_aux(aux))
        if serialize_steps:
            # virtual CPU meshes (host-platform device_count > n cores):
            # a SECOND in-flight execution's collective rendezvous can
            # occupy every executor thread while an earlier execution
            # still needs one to finish -- a true deadlock (observed as
            # xla rendezvous terminate timeouts in the 8-device dryrun
            # on a 2-core host). One execution in flight at a time is
            # free here: CPU meshes are a correctness substrate, and
            # the real-hardware path (tpu backend) is unaffected.
            jax.block_until_ready((params, opt_state, states))
        prof["dispatch"] += _time.perf_counter() - t0

        if (monitor_verbose >= 2 and not multiproc
                and prev_monitor_frames // 25000
                != monitor_frames // 25000):
            # every-25k-frames moment dump at vlog-2 (reference
            # :251-260): post-step params, post-increment frame label;
            # under grouping the dump lands at group granularity
            _monitor_first_batch(nnet, params, transf, transf_params,
                                 group[0], opts, crossvalidate,
                                 total_frames=monitor_frames, level=2)

        if len(pending) >= STATS_FLUSH:
            t0 = _time.perf_counter()
            total_frames = _flush_stats(pending, stats, scheduler,
                                        total_frames, deferred)
            prof["stats"] += _time.perf_counter() - t0

        # speed report every 1000 utterances (:263-267); deferred mode
        # reports the host-side masked-frame count (same quantity the
        # device aux carries) instead of forcing a mid-epoch fetch
        if consumed_done - last_report_done >= 1000:
            t0 = _time.perf_counter()
            total_frames = _flush_stats(pending, stats, scheduler,
                                        total_frames, deferred)
            prof["stats"] += _time.perf_counter() - t0
            last_report_done = consumed_done - consumed_done % 1000
            t = timer.elapsed()
            rep_frames = monitor_frames if defer else total_frames
            VLOG(1, f"After {consumed_done} utterances: time elapsed = "
                    f"{t / 60:.2f} min; processed {rep_frames / t:.0f} "
                    f"frames per second.")

        # deferred-stats health boundary (see init above): flush and
        # check finiteness at a coarse utterance interval
        if (defer and health_interval > 0
                and consumed_done - last_health_done >= health_interval):
            t0 = _time.perf_counter()
            total_frames = _flush_stats(pending, stats, scheduler,
                                        total_frames, deferred,
                                        final=True)
            prof["stats"] += _time.perf_counter() - t0
            last_health_done = (consumed_done
                                - consumed_done % health_interval)

        # multi-process: trigger on the GLOBAL step count (identical on
        # every host by SyncedScheduler construction) -- the gather inside
        # dump_fn is collective and must fire on all hosts together;
        # a local-utterance trigger could fire on a subset and deadlock
        dump_progress = batch_idx if multiproc else consumed_done
        if (dump_interval > 0 and dump_fn is not None
                and dump_progress - last_dump_done >= dump_interval):
            last_dump_done = dump_progress - dump_progress % dump_interval
            if not crossvalidate:
                dump_fn(params, consumed_done)
                if defer:
                    # a model dump already pays a transfer — piggyback a
                    # stats flush + health check on the same boundary
                    total_frames = _flush_stats(pending, stats,
                                                scheduler, total_frames,
                                                deferred, final=True)

    t0 = _time.perf_counter()
    total_frames = _flush_stats(pending, stats, scheduler, total_frames,
                                deferred, final=True)
    prof["stats"] += _time.perf_counter() - t0
    elapsed = timer.elapsed()
    import os as _os
    if _os.environ.get("KLT_EPOCH_PROFILE") or monitor_verbose >= 2:
        other = elapsed - prof["wait"] - prof["dispatch"] - prof["stats"]
        LOG(f"epoch profile ({batch_idx} steps, {elapsed:.2f}s wall): "
            f"wait_data {prof['wait']:.2f}s, dispatch "
            f"{prof['dispatch']:.2f}s, stats_fetch {prof['stats']:.2f}s, "
            f"other_host {other:.2f}s "
            f"(stage+H2D {prof['stage']:.2f}s, "
            f"{'overlapped' if not multiproc else 'inline'})")
    return EpochResult(params=params, opt_state=opt_state, stats=stats,
                       num_done=scheduler.num_done,
                       total_frames=total_frames,
                       elapsed=elapsed)


STATS_FLUSH = 32  # batches of device stats fetched per host transfer


@functools.lru_cache(maxsize=8)
def _pack_aux_fn(ndim: int):
    """Jitted packer: LossAux of scalars (plain step) or [B] vectors
    (grouped step) -> ONE [n, 4] f32 device array in step order. One
    dispatch per append replaces the ~4-6 eager device ops per entry the
    old flush paid (2-3 s/epoch at the flagship shape on the tunnel);
    only two shapes ever occur (group size and tail), so the cache
    compiles twice per run — not the per-pending-count retrace trap
    (143 s) that killed the round-3 jitted-packer attempt."""
    @jax.jit
    def pack(a: LossAux):
        rows = jnp.stack([a.xent.astype(jnp.float32),
                          a.entropy.astype(jnp.float32),
                          a.correct.astype(jnp.float32),
                          a.frames.astype(jnp.float32)])
        return rows.reshape(4, -1).T                       # [n, 4]
    return pack


def _pack_aux(a: LossAux):
    return _pack_aux_fn(int(jnp.ndim(a.xent)))(a)


def _stats_defer_default() -> bool:
    """Defer ALL stats D2H transfers to the epoch end on transport-bound
    backends (the axon tunnel: ~1 s per fetch serialized against the
    pipeline; VERDICT r3 weak #4). KLT_STATS_DEFER=1/0 forces. Deferred
    mode trades mid-epoch progressive logs and the per-flush non-finite
    check (they all land at epoch end) for an epoch critical path with
    ZERO stats transfers; the 1000-utterance fps report uses the
    host-side masked-frame count instead."""
    import os
    v = os.environ.get("KLT_STATS_DEFER", "")
    if v in ("0", "1"):
        return v == "1"
    return _on_tunnel_backend()


def _on_tunnel_backend() -> bool:
    """True on the tunneled-TPU transport. The axon plugin registers
    its devices under the regular 'tpu' backend name (measured round 4:
    jax.default_backend() == 'tpu' on the tunnel — a name check on
    'axon' never fires), so the reliable marker is the pool env var
    the platform is configured through, combined with a non-CPU
    backend."""
    import os
    try:
        if jax.default_backend() == "axon":
            return True
        return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) \
            and jax.default_backend() != "cpu"
    except Exception:
        return False


def _flush_stats(pending, stats: LossStats, scheduler,
                 total_frames: int, deferred: Optional[list] = None,
                 final: bool = False) -> int:
    """Feed buffered per-batch stats to the host accumulator with ONE
    device concat + ONE transfer; health-check for non-finite loss (the
    reference polls CheckGpuHealth every 1000 utterances, :269-272).
    Entries are jit-packed [n, 4] blocks (see _pack_aux). With
    `deferred` (a list) and not `final`, the fetch is POSTPONED: the
    concatenated block is parked there; the epoch-end `final` call
    fetches everything in one transfer — the per-leaf device_get
    alternative pays a ~30 s D2H synchronization PER SMALL ARRAY on the
    tunnel (1459 s/epoch measured round 3), so everything funnels into
    single concatenated transfers."""
    if pending:
        block_dev = (pending[0] if len(pending) == 1
                     else jnp.concatenate(pending, axis=0))
        pending.clear()
        if deferred is not None:
            deferred.append(block_dev)
            if not final:
                return total_frames
        else:
            deferred = [block_dev]
    if not deferred:
        return total_frames
    block = np.asarray(jnp.concatenate(deferred, axis=0)
                       if len(deferred) > 1 else deferred[0])
    deferred.clear()
    for xent, ent, correct, frames in block:
        if not np.isfinite(xent):
            raise FloatingPointError(
                f"non-finite loss after {scheduler.num_done} utterances "
                f"— learning rate too high or corrupt input; "
                f"xent={xent}")
        stats.add(LossAux(xent=float(xent), entropy=float(ent),
                          correct=float(correct), frames=float(frames)),
                  log_fn=lambda m: VLOG(1, m))
        total_frames += float(frames)
    return total_frames
