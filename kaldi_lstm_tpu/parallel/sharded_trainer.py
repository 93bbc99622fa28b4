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
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from kaldi_lstm_tpu.models.nnet import Nnet
from kaldi_lstm_tpu.parallel.mesh import MeshPlan
from kaldi_lstm_tpu.train.loss import masked_mse_loss, masked_xent_loss
from kaldi_lstm_tpu.train.optim import momentum_update
from kaldi_lstm_tpu.train.trainer import TrainOptions

_LOSS_FNS = {"xent": masked_xent_loss, "mse": masked_mse_loss}


def _fused_eligible(nnet: Nnet, opts: TrainOptions, plan: MeshPlan) -> bool:
    """Fused TP xent requires an [Affine, Softmax] tail, xent objective,
    and the senone count divisible by the model-axis size (shard_map
    needs even shards). Auto mode mirrors trainer.make_train_step: on
    when the compute backend is TPU."""
    from kaldi_lstm_tpu.models.components import _on_tpu
    from kaldi_lstm_tpu.train.trainer import _tail_is_affine_softmax
    fused_wanted = (_on_tpu() if opts.fused_xent is None
                    else opts.fused_xent)
    if not (fused_wanted and opts.objective == "xent"
            and _tail_is_affine_softmax(nnet)):
        return False
    k = nnet.components[-2].output_dim
    return k % plan.mesh.shape.get("model", 1) == 0


def make_sharded_train_step(nnet: Nnet, opts: TrainOptions, plan: MeshPlan,
                            transf: Optional[Nnet] = None,
                            crossvalidate: bool = False,
                            params_example=None, states_example=None,
                            transf_params_example=()):
    """Build the pjit'd step with explicit in/out shardings.

    `*_example` args provide pytree structure for the sharding specs
    (shapes are not needed, only the tree).
    """
    loss_fn = _LOSS_FNS[opts.objective]
    p_shard = plan.params_sharding(params_example)
    s_shard = plan.states_sharding(states_example)
    b_shard = plan.batch_sharding()
    repl = plan.replicated()

    from kaldi_lstm_tpu.train.optim import MomentumState
    opt_shard = MomentumState(corr=p_shard)

    use_fused = _fused_eligible(nnet, opts, plan)
    if use_fused:
        from kaldi_lstm_tpu.parallel.xent_tp import make_tp_fused_xent
        fused_fn = make_tp_fused_xent(plan.mesh)
    else:
        fused_fn = None
    from kaldi_lstm_tpu.train.trainer import make_objective
    objective_fn = make_objective(nnet, loss_fn, use_fused, fused_fn,
                                  train=not crossvalidate)

    def step_fn(params, opt_state, states, transf_params, feats, tgt_ids,
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
        from kaldi_lstm_tpu.train.trainer import (
            apply_max_norm, build_lr_scale, build_reg_mask,
            nnet_has_max_norm)
        params, opt_state = momentum_update(
            params, grads, opt_state, learn_rate, opts.momentum,
            opts.grad_clip, lr_scale=build_lr_scale(nnet, params),
            l1_penalty=opts.l1_penalty, l2_penalty=opts.l2_penalty,
            num_frames=x.shape[0] * x.shape[1],
            reg_mask=build_reg_mask(nnet, params))
        if nnet_has_max_norm(nnet):
            params = apply_max_norm(nnet, params)
        return params, opt_state, new_states, aux

    transf_shard = jax.tree_util.tree_map(lambda _: repl,
                                          transf_params_example)
    in_shardings = (
        p_shard, opt_shard, s_shard, transf_shard,
        b_shard["feats"], b_shard["tgt_ids"], b_shard["tgt_weights"],
        b_shard["mask"], b_shard["reset_flags"], repl,
    )
    from kaldi_lstm_tpu.train.loss import LossAux
    aux_shard = LossAux(xent=repl, entropy=repl, correct=repl, frames=repl)
    out_shardings = (p_shard, opt_shard, s_shard, aux_shard)

    donate = () if crossvalidate else (0, 1, 2)
    return jax.jit(step_fn, in_shardings=in_shardings,
                   out_shardings=out_shardings, donate_argnums=donate)
