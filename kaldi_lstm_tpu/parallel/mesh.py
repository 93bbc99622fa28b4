"""Device-mesh layout and sharding plans.

The reference is single-process / single-GPU (SURVEY.md §2.3); scaling
out is a new first-class design here, following BASELINE.json's north
star:

* mesh axes ``('data', 'model')``;
* **data parallelism over streams**: the stream axis S of every batch
  tensor and LSTM carry shards over ``data`` — each chip advances its own
  subset of utterance streams, XLA inserts the gradient all-reduce
  (psum over ICI) because parameters are replicated along ``data``;
* **tensor parallelism for the senone output layer**: the last
  AffineTransform (e.g. 16624 senones, /root/reference/README.md:27)
  shards its output dimension over ``model``; the masked softmax-xent is
  computed distributed (per-shard max/sum + collectives, inserted by
  GSPMD from the sharding constraints);
* everything else (LSTM weights, feature transform) is replicated —
  LSTMP weights are ~15 MB and the recurrent matmul needs them whole.

No hand-written collectives: shardings constrain, XLA compiles the
communication (the scaling-book recipe).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kaldi_lstm_tpu.models.components import AffineTransform
from kaldi_lstm_tpu.models.nnet import Nnet


def make_mesh(data: int = 1, model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh from the available devices."""
    devices = devices if devices is not None else jax.devices()
    if data * model > len(devices):
        raise ValueError(f"mesh {data}x{model} needs {data * model} "
                         f"devices, have {len(devices)}")
    devs = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(devs, axis_names=("data", "model"))


class MeshPlan:
    """Sharding specs for a given Nnet on a given mesh."""

    def __init__(self, mesh: Mesh, nnet: Nnet,
                 shard_output_layer: bool = True):
        self.mesh = mesh
        self.nnet = nnet
        # index of the senone output AffineTransform (TP target): the last
        # affine component, sharded only when it is the widest layer
        self.tp_index: Optional[int] = None
        if shard_output_layer and mesh.shape.get("model", 1) > 1:
            for i, c in enumerate(nnet.components):
                if isinstance(c, AffineTransform):
                    self.tp_index = i

    def _named(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    # ------------------------------------------------------------------
    def params_sharding(self, params: Any) -> Any:
        """Pytree of NamedSharding matching `params`."""
        out = []
        for i, (c, p) in enumerate(zip(self.nnet.components, params)):
            if i == self.tp_index:
                out.append({
                    # linearity [out, in]: shard senone rows over 'model'
                    "linearity": self._named(P("model", None)),
                    "bias": self._named(P("model")),
                })
            else:
                out.append(jax.tree_util.tree_map(
                    lambda _: self._named(P()), p))
        return tuple(out)

    def opt_sharding(self, opt_state: Any) -> Any:
        from kaldi_lstm_tpu.train.optim import MomentumState
        return MomentumState(corr=self.params_sharding(opt_state.corr))

    def states_sharding(self, states: Any) -> Any:
        """Carry states: stream axis (dim 0) over 'data'."""
        return tuple(
            None if s is None else jax.tree_util.tree_map(
                lambda _: self._named(P("data")), s)
            for s in states)

    def batch_sharding(self, group: bool = False) -> dict:
        """Shardings for (feats, tgt_ids, tgt_weights, mask, reset_flags).

        With `group`, every array carries a leading replicated group axis
        B (a lax.scan device loop over pre-staged batches — the grouped
        sharded step); the stream axis shifts to dim 1."""
        g = (None,) if group else ()
        return {
            "feats": self._named(P(*g, "data", None, None)),
            "tgt_ids": self._named(P(*g, "data", None, None)),
            "tgt_weights": self._named(P(*g, "data", None, None)),
            "mask": self._named(P(*g, "data", None)),
            "reset_flags": self._named(P(*g, "data")),
        }

    def replicated(self) -> NamedSharding:
        return self._named(P())

    # ------------------------------------------------------------------
    def _put(self, arr, sharding: NamedSharding):
        """device_put that also works multi-process: every process holds
        the FULL host array (params are replicated host-side; initial
        states are zeros) and contributes its addressable shards via
        make_array_from_callback."""
        if jax.process_count() == 1:
            return jax.device_put(arr, sharding)
        a = np.asarray(arr)
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx: a[idx])

    def place_params(self, params: Any) -> Any:
        return jax.tree_util.tree_map(
            self._put, params, self.params_sharding(params))

    def place_states(self, states: Any) -> Any:
        shardings = self.states_sharding(states)
        return tuple(
            s if sh is None else jax.tree_util.tree_map(self._put, s, sh)
            for s, sh in zip(states, shardings))

    def gather_params(self, params: Any) -> Any:
        """Replicate + fetch params to host numpy (for model writes).
        Collective on multi-process — every process must call it."""
        repl = jax.tree_util.tree_map(lambda _: self._named(P()), params)
        gathered = jax.jit(lambda p: p, out_shardings=repl)(params)
        return jax.tree_util.tree_map(np.asarray,
                                      jax.device_get(gathered))

    def place_batch(self, feats, tgt_ids, tgt_weights, mask, reset_flags,
                    group: bool = False):
        bs = self.batch_sharding(group=group)
        return (jax.device_put(jnp.asarray(feats), bs["feats"]),
                jax.device_put(jnp.asarray(tgt_ids), bs["tgt_ids"]),
                jax.device_put(jnp.asarray(tgt_weights), bs["tgt_weights"]),
                jax.device_put(jnp.asarray(mask), bs["mask"]),
                jax.device_put(jnp.asarray(reset_flags), bs["reset_flags"]))

    def place_opt(self, opt_state: Any) -> Any:
        return jax.tree_util.tree_map(
            self._put, opt_state, self.opt_sharding(opt_state))
