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
                    grad_clip: float = 0.0, lr_scale: Params = None
                    ) -> tuple[Params, MomentumState]:
    """`lr_scale` is an optional pytree of per-leaf scalars implementing
    nnet1's <LearnRateCoef>/<BiasLearnRateCoef> (0 freezes a tensor)."""
    def acc(g, c):
        new = g + momentum * c
        if grad_clip > 0:
            new = jnp.clip(new, -grad_clip, grad_clip)
        return new

    corr = jax.tree_util.tree_map(acc, grads, opt_state.corr)
    if lr_scale is None:
        new_params = jax.tree_util.tree_map(
            lambda p, c: p - learn_rate * c, params, corr)
    else:
        new_params = jax.tree_util.tree_map(
            lambda p, c, s: p - (learn_rate * s) * c, params, corr,
            lr_scale)
    return new_params, MomentumState(corr=corr)
