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

_FETCH_CACHE: dict = {}


def fetch_tree_host(tree: Any) -> Any:
    """Materialize a pytree of float device arrays on host with ONE D2H
    transfer: a cached jitted concat of all raveled leaves, one
    np.asarray, host-side split. Per-leaf np.asarray pays a per-transfer
    synchronization on tunneled devices (~30 s worst case per array,
    CLAUDE.md cost model; model fetch+write measured 2.2 s/iteration at
    the deep shape round 3 — most of it per-leaf transfer overhead).
    Non-float leaves (or non-device trees) fall back to plain
    device_get."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    ok_dt = (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
             jnp.dtype(jnp.float16))  # lossless through an f32 wire
    if not leaves or not all(
            isinstance(x, jax.Array) and x.dtype in ok_dt
            for x in leaves):
        return jax.device_get(tree)
    key = (treedef, tuple(x.shape for x in leaves),
           tuple(str(x.dtype) for x in leaves))
    fn = _FETCH_CACHE.get(key)
    if fn is None:
        @jax.jit
        def fn(ls):
            return jnp.concatenate(
                [jnp.ravel(x).astype(jnp.float32) for x in ls])
        _FETCH_CACHE[key] = fn
    flat = np.asarray(fn(leaves))
    out, off = [], 0
    for x in leaves:
        n = int(np.prod(x.shape)) if x.ndim else 1
        out.append(flat[off:off + n].reshape(x.shape)
                   .astype(np.dtype(str(x.dtype))))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def save_train_state(path: str, params: Any,
                     opt_state: Optional[MomentumState] = None,
                     meta: Optional[dict] = None) -> None:
    # one combined D2H transfer for params+momentum (tunnel cost model)
    fetched = fetch_tree_host(
        (params, opt_state.corr if opt_state is not None else ()))
    leaves_p, tree_p = jax.tree_util.tree_flatten(fetched[0])
    payload = {f"p{i}": np.asarray(x) for i, x in enumerate(leaves_p)}
    if opt_state is not None:
        leaves_o, _ = jax.tree_util.tree_flatten(fetched[1])
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
