"""Native checkpointing with optimizer state.

The reference checkpoints only component weights (§3.4); momentum buffers
are lost on restart (SURVEY.md §5 checkpoint/resume). Here the full train
state — params, momentum corr, and scalar metadata (iteration, learn-rate,
running loss stats) — round-trips through one .npz (tensor payload) so an
interrupted run resumes bit-exactly. The Kaldi-format model file remains
the interchange format; this is the fast native format next to it.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.train.optim import MomentumState


def save_train_state(path: str, params: Any,
                     opt_state: Optional[MomentumState] = None,
                     meta: Optional[dict] = None) -> None:
    leaves_p, tree_p = jax.tree_util.tree_flatten(params)
    payload = {f"p{i}": np.asarray(x) for i, x in enumerate(leaves_p)}
    if opt_state is not None:
        leaves_o, _ = jax.tree_util.tree_flatten(opt_state.corr)
        payload.update({f"o{i}": np.asarray(x)
                        for i, x in enumerate(leaves_o)})
    payload["__meta__"] = np.frombuffer(
        json.dumps({"meta": meta or {},
                    "num_params": len(leaves_p),
                    "has_opt": opt_state is not None}).encode(), np.uint8)
    # write through a file object: np.savez(path) silently appends .npz
    # to bare paths, breaking --state-out x / --state-in x round-trips
    with open(path, "wb") as f:
        np.savez(f, **payload)


def load_train_state(path: str, params_example: Any
                     ) -> tuple[Any, Optional[MomentumState], dict]:
    """Restore (params, opt_state, meta); `params_example` supplies the
    pytree structure."""
    with np.load(path) as z:
        info = json.loads(bytes(z["__meta__"].tobytes()).decode())
        n = info["num_params"]
        leaves = [jnp.asarray(z[f"p{i}"]) for i in range(n)]
        _, tree = jax.tree_util.tree_flatten(params_example)
        params = jax.tree_util.tree_unflatten(tree, leaves)
        opt_state = None
        if info["has_opt"]:
            corr = jax.tree_util.tree_unflatten(
                tree, [jnp.asarray(z[f"o{i}"]) for i in range(n)])
            opt_state = MomentumState(corr=corr)
    return params, opt_state, info["meta"]
