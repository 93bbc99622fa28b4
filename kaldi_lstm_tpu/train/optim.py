"""SGD with classical momentum, nnet1 semantics.

The reference folds momentum into the gradient GEMMs as beta
(`w_gifo_x_corr_.AddMatMat(1.0, ..., mmt)`,
bd-nnet-lstm-projected-streams.h:465-487) and applies `w -= lr * corr`
(:501-513). Equivalently:

    corr_t = grad_t + momentum * corr_{t-1}        (grads SUMMED over frames)
    w_t    = w_{t-1} - lr * corr_t

The standard variant additionally clips corr element-wise to ±50 *in
place* before the update (standard/nnet/nnet-lstm-projected.h:480-493), so
the carried momentum buffer is the clipped one — `grad_clip` reproduces
that.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Params = Any


class MomentumState(NamedTuple):
    corr: Params  # momentum-accumulated correction, same pytree as params


def init_momentum(params: Params) -> MomentumState:
    return MomentumState(
        corr=jax.tree_util.tree_map(jnp.zeros_like, params))


def momentum_update(params: Params, grads: Params, opt_state: MomentumState,
                    learn_rate: float, momentum: float = 0.0,
                    grad_clip: float = 0.0, lr_scale: Params = None,
                    l1_penalty: float = 0.0, l2_penalty: float = 0.0,
                    num_frames: int = 0, reg_mask: Params = None
                    ) -> tuple[Params, MomentumState]:
    """`lr_scale` is an optional pytree of per-leaf scalars implementing
    nnet1's <LearnRateCoef>/<BiasLearnRateCoef> (0 freezes a tensor).

    `l1_penalty`/`l2_penalty` reproduce upstream NnetTrainOptions
    regularization, applied exactly where nnet1 applies it — the
    AffineTransform linearity (`reg_mask` leaf == 1; upstream
    nnet-affine-transform.h Update; the reference LSTM's own Update has
    no l1/l2, matching reg_mask == 0 there). Upstream order and scaling
    (both scaled by lr and by num_frames = rows of the minibatch,
    padding included):
      1. corr = grad + mmt*corr            (the momentum GEMMs)
      2. l2: w -= lr*l2*num_frames * w     (decay of the OLD weights)
      3. l1: cu::RegularizeL1(w, corr, lr*l1*num_frames, lr) — shrink
         each nonzero weight by the signed l1 amount unless the full
         update would cross zero, in which case weight := 0 and its
         corr entry := 0 (the zeroed corr is what momentum carries)
      4. w -= lr*corr
    """
    def acc(g, c):
        new = g + momentum * c
        if grad_clip > 0:
            new = jnp.clip(new, -grad_clip, grad_clip)
        return new

    corr = jax.tree_util.tree_map(acc, grads, opt_state.corr)
    if lr_scale is None:
        lr_scale = jax.tree_util.tree_map(lambda _: 1.0, params)
    if reg_mask is None:
        reg_mask = jax.tree_util.tree_map(lambda _: 0.0, params)

    def upd(p, c, s, m):
        lr = learn_rate * s
        if l2_penalty != 0.0 and m:
            p = p - (lr * l2_penalty * num_frames) * p
        if l1_penalty != 0.0 and m:
            l1v = lr * l1_penalty * num_frames
            nonzero = p != 0.0
            l1_signed = jnp.where(p > 0.0, l1v, -l1v)
            after = p - lr * c - l1_signed
            cross = nonzero & ((after > 0.0) != (p > 0.0))
            p = jnp.where(nonzero, jnp.where(cross, 0.0, p - l1_signed), p)
            c = jnp.where(cross, 0.0, c)
        return p - lr * c, c

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_c = treedef.flatten_up_to(corr)
    flat_s = treedef.flatten_up_to(lr_scale)
    flat_m = treedef.flatten_up_to(reg_mask)
    out = [upd(p, c, s, m) for p, c, s, m in
           zip(flat_p, flat_c, flat_s, flat_m)]
    new_params = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
    new_corr = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
    return new_params, MomentumState(corr=new_corr)
