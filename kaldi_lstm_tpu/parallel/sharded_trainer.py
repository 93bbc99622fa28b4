"""pjit'd multi-chip training step.

Same math as train.trainer.make_train_step, compiled over a
('data', 'model') mesh: in/out shardings from a MeshPlan pin streams to
the data axis and the senone layer to the model axis; GSPMD inserts the
gradient psum (data axis, over ICI) and the TP collectives for the
sharded softmax-xent. Multi-host entry: call jax.distributed.initialize()
before building the mesh and feed each host its local stream shard.
"""

from __future__ import annotations

from typing import Optional

import jax

from kaldi_lstm_tpu.models.nnet import Nnet
from kaldi_lstm_tpu.parallel.mesh import MeshPlan
from kaldi_lstm_tpu.train.trainer import TrainOptions


def _fused_eligible(nnet: Nnet, opts: TrainOptions, plan: MeshPlan,
                    states_example=None) -> bool:
    """Fused TP xent requires an [Affine, Softmax] tail, xent objective,
    and the senone count divisible by the model-axis size (shard_map
    needs even shards); otherwise fall back to the GSPMD (non-fused)
    path. Auto mode mirrors trainer.make_train_step: on when the compute
    backend is TPU. (Stream-count divisibility over the data axis is a
    constraint of the batch sharding itself, validated separately in
    make_sharded_train_step.)"""
    from kaldi_lstm_tpu.train.trainer import default_use_fused
    if not default_use_fused(nnet, opts):
        return False
    k = nnet.components[-2].output_dim
    return k % plan.mesh.shape.get("model", 1) == 0


def _validate_stream_count(plan: MeshPlan, states_example) -> None:
    """Fail fast with a clear message when S does not divide over the
    data axis (the GSPMD error otherwise surfaces as a cryptic
    device_put failure at the first step)."""
    data = plan.mesh.shape.get("data", 1)
    if states_example is None or data <= 1:
        return
    for leaf in jax.tree_util.tree_leaves(states_example):
        if hasattr(leaf, "shape") and len(leaf.shape) >= 1:
            s = leaf.shape[0]
            if s % data != 0:
                raise ValueError(
                    f"num_stream={s} is not divisible by the mesh data "
                    f"axis ({data}); pick S as a multiple of the data "
                    f"axis (pad with dummy streams if needed — masked "
                    f"frames contribute nothing)")
            return


def _build_sharded(nnet: Nnet, opts: TrainOptions, plan: MeshPlan,
                   transf: Optional[Nnet], crossvalidate: bool,
                   params_example, states_example, transf_params_example,
                   group: bool):
    """Common scaffolding for the plain and grouped sharded steps:
    sharding specs + the un-jitted single-step body."""
    _validate_stream_count(plan, states_example)
    p_shard = plan.params_sharding(params_example)
    s_shard = plan.states_sharding(states_example)
    b_shard = plan.batch_sharding(group=group)
    repl = plan.replicated()

    from kaldi_lstm_tpu.train.optim import MomentumState
    opt_shard = MomentumState(corr=p_shard)

    use_fused = _fused_eligible(nnet, opts, plan, states_example)
    if use_fused:
        from kaldi_lstm_tpu.parallel.xent_tp import make_tp_fused_xent
        fused_fn = make_tp_fused_xent(plan.mesh)
    else:
        fused_fn = None
    # the step body is the single-chip one (train/trainer.py) with the
    # tensor-parallel fused kernel substituted; time-major stays off
    # (the batch shardings are declared stream-major)
    from kaldi_lstm_tpu.train.trainer import _make_step_fn
    step_fn = _make_step_fn(nnet, opts, transf, crossvalidate,
                            use_fused=use_fused, fused_fn=fused_fn,
                            time_major=False)

    transf_shard = jax.tree_util.tree_map(lambda _: repl,
                                          transf_params_example)
    from kaldi_lstm_tpu.train.loss import LossAux
    aux_shard = LossAux(xent=repl, entropy=repl, correct=repl, frames=repl)
    return (step_fn, p_shard, opt_shard, s_shard, b_shard, transf_shard,
            aux_shard, repl)


def make_sharded_train_step(nnet: Nnet, opts: TrainOptions, plan: MeshPlan,
                            transf: Optional[Nnet] = None,
                            crossvalidate: bool = False,
                            params_example=None, states_example=None,
                            transf_params_example=()):
    """Build the pjit'd step with explicit in/out shardings.

    `*_example` args provide pytree structure for the sharding specs
    (shapes are not needed, only the tree).
    """
    (step_fn, p_shard, opt_shard, s_shard, b_shard, transf_shard,
     aux_shard, repl) = _build_sharded(
        nnet, opts, plan, transf, crossvalidate, params_example,
        states_example, transf_params_example, group=False)
    in_shardings = (
        p_shard, opt_shard, s_shard, transf_shard,
        b_shard["feats"], b_shard["tgt_ids"], b_shard["tgt_weights"],
        b_shard["mask"], b_shard["reset_flags"], repl, repl,
    )
    out_shardings = (p_shard, opt_shard, s_shard, aux_shard)

    donate = () if crossvalidate else (0, 1, 2)
    jitted = jax.jit(step_fn, in_shardings=in_shardings,
                     out_shardings=out_shardings, donate_argnums=donate)

    def call(params, opt_state, states, transf_params, feats, tgt_ids,
             tgt_weights, mask, reset_flags, learn_rate, rng=None):
        # rng is passed positionally so the 11-entry in_shardings always
        # binds; pass a PRNG key per step to drive dropout components
        # (None = deterministic, dropout layers no-op)
        return jitted(params, opt_state, states, transf_params, feats,
                      tgt_ids, tgt_weights, mask, reset_flags,
                      learn_rate, rng)

    return call


def make_sharded_grouped_train_step(
        nnet: Nnet, opts: TrainOptions, plan: MeshPlan,
        transf: Optional[Nnet] = None, crossvalidate: bool = False,
        params_example=None, states_example=None,
        transf_params_example=()):
    """Grouped (dispatch-amortized) sharded step: ONE device dispatch runs
    a lax.scan over B pre-staged batches (leading axis B on every batch
    array, replicated; stream axis sharded over 'data' as in the plain
    step). Identical math to B calls of make_sharded_train_step — grouping
    is worth ~+37% single-chip (BENCH_r02) and pods pay the same
    per-dispatch latency, so the sharded path gets the same treatment.
    `rngs` is an optional [B]-keys array for dropout."""
    (step_fn, p_shard, opt_shard, s_shard, b_shard, transf_shard,
     aux_shard, repl) = _build_sharded(
        nnet, opts, plan, transf, crossvalidate, params_example,
        states_example, transf_params_example, group=True)

    import jax.numpy as jnp  # noqa: F401  (scan body traces jnp ops)

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

    # per-step aux stacks to [B]-shaped LossAux, replicated
    from kaldi_lstm_tpu.train.loss import LossAux
    auxs_shard = LossAux(xent=repl, entropy=repl, correct=repl,
                         frames=repl)
    in_shardings = (
        p_shard, opt_shard, s_shard, transf_shard,
        b_shard["feats"], b_shard["tgt_ids"], b_shard["tgt_weights"],
        b_shard["mask"], b_shard["reset_flags"], repl, repl,
    )
    out_shardings = (p_shard, opt_shard, s_shard, auxs_shard)
    jitted = jax.jit(gstep, in_shardings=in_shardings,
                     out_shardings=out_shardings,
                     donate_argnums=() if crossvalidate else (0, 1, 2))

    def call(params, opt_state, states, transf_params, feats, tgt_ids,
             tgt_weights, mask, reset_flags, learn_rate, rngs=None):
        return jitted(params, opt_state, states, transf_params, feats,
                      tgt_ids, tgt_weights, mask, reset_flags,
                      learn_rate, rngs)

    return call
