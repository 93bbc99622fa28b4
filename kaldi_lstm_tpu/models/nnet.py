"""Sequential Nnet container: functional propagate + Kaldi serialization.

Re-design of nnet1's `Nnet` (google/nnet/nnet-nnet.h:46-138): the container
holds the static component stack; parameters and recurrent states are
explicit tuples so `propagate` is a pure function suitable for jit/grad.
The imperative `Reset(flags)` of the reference becomes `reset_states`
(mask-multiply on the carried state, applied before the chunk).

Serialization: `<Nnet>` ... per-component `<Marker> out_dim in_dim` +
component data ... `</Nnet>`, in Kaldi text or binary mode, so reference
checkpoints cross-load (see /root/reference/README.md:24-29 for the text
shape this reproduces).
"""

from __future__ import annotations

import io
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.io import kaldi_io as kio
from kaldi_lstm_tpu.models import components as comp
from kaldi_lstm_tpu.models.components import Component, Softmax

ParamsList = Any  # tuple of per-component param pytrees
StatesList = Any  # tuple of per-component state pytrees (None if stateless)


class Nnet:
    """Static component stack. Params/states live outside the object."""

    def __init__(self, components: Optional[List[Component]] = None):
        self.components: List[Component] = components or []

    # ------------------------------------------------------------------
    # structure
    # ------------------------------------------------------------------
    @property
    def input_dim(self) -> int:
        return self.components[0].input_dim if self.components else 0

    @property
    def output_dim(self) -> int:
        return self.components[-1].output_dim if self.components else 0

    def append(self, component: Component) -> None:
        self.components.append(component)

    def __len__(self):
        return len(self.components)

    # ------------------------------------------------------------------
    # numerics
    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> ParamsList:
        keys = jax.random.split(rng, max(len(self.components), 1))
        return tuple(c.init_params(k)
                     for c, k in zip(self.components, keys))

    def init_states(self, nstream: int) -> StatesList:
        return tuple(c.init_state(nstream) for c in self.components)

    def propagate(self, params: ParamsList, x: jax.Array,
                  states: Optional[StatesList] = None,
                  logits: bool = False, rng: Optional[jax.Array] = None,
                  train: bool = False,
                  advance_mask: Optional[jax.Array] = None
                  ) -> tuple[jax.Array, StatesList]:
        """Forward through all components ([S, T, D] activations).

        With ``logits=True`` a trailing Softmax is skipped so the loss can
        consume pre-softmax activations (jax.grad then reproduces nnet1's
        combined softmax+xent backward, diff = y - t). ``rng``/``train``
        feed stochastic components (LSTM gate dropout).
        ``advance_mask`` ([S, T] 0/1) freezes the carried state of
        stateful components at masked frames (per-slot valid lengths in
        a heterogeneous-arrival serving batch; see lstm_cell.lstm_scan).
        """
        if states is None:
            states = tuple(None for _ in self.components)
        new_states = []
        for i, (c, p, s) in enumerate(zip(self.components, params, states)):
            if logits and i == len(self.components) - 1 and \
                    isinstance(c, Softmax):
                new_states.append(s)
                break
            kwargs = {}
            if advance_mask is not None and getattr(c, "stateful", False):
                kwargs["advance_mask"] = advance_mask
            if getattr(c, "uses_rng", False):
                crng = None if rng is None else jax.random.fold_in(rng, i)
                x, s2 = c.apply(p, x, s, rng=crng, train=train, **kwargs)
            else:
                x, s2 = c.apply(p, x, s, **kwargs)
            new_states.append(s2)
        return x, tuple(new_states)

    def feedforward(self, params: ParamsList, x: jax.Array) -> jax.Array:
        """Propagate without carrying state (decode / feature transform —
        nnet-nnet.h Feedforward)."""
        y, _ = self.propagate(params, x)
        return y

    def reset_states(self, states: StatesList,
                     reset_flags: jax.Array) -> StatesList:
        """Zero the state rows of streams whose flag is 1 — functional
        equivalent of Nnet::Reset → LstmProjectedStreams::Reset
        (bd-nnet-lstm-projected-streams.h:212-220). `reset_flags` is [S]
        (1 = new utterance in that stream)."""
        keep = (1.0 - reset_flags.astype(jnp.float32))

        def mask_leaf(leaf):
            return leaf * keep.reshape((-1,) + (1,) * (leaf.ndim - 1))

        return tuple(
            None if s is None else jax.tree_util.tree_map(mask_leaf, s)
            for s in states)

    # ------------------------------------------------------------------
    # monitoring
    # ------------------------------------------------------------------
    def num_params(self, params: ParamsList) -> int:
        return sum(c.num_params(p)
                   for c, p in zip(self.components, params))

    def info(self, params: ParamsList) -> str:
        lines = [f"num-components {len(self.components)}",
                 f"input-dim {self.input_dim}",
                 f"output-dim {self.output_dim}",
                 f"number-of-parameters {self.num_params(params) / 1e6:.4g} "
                 f"millions"]
        for i, (c, p) in enumerate(zip(self.components, params)):
            lines.append(f"component {i + 1} : {c.token[1:-1]}, "
                         f"input-dim {c.input_dim}, "
                         f"output-dim {c.output_dim}")
            s = c.info(p)
            if s:
                lines.append("  " + s)
        return "\n".join(lines)

    def info_propagate(self, params: ParamsList, x: jax.Array,
                       states: Optional[StatesList] = None) -> str:
        """Per-component activation moment statistics (the reference's
        InfoPropagate dump at the first minibatch and every 25k frames,
        bd-nnet-train-lstm-streams.cc:232-260)."""
        from kaldi_lstm_tpu.models.components import moment_statistics
        if states is None:
            states = tuple(None for _ in self.components)
        lines = [f"### Forward propagation buffer content :"]
        lines.append("  " + moment_statistics("[input]", np.asarray(x)))
        for c, p, s in zip(self.components, params, states):
            x, _ = c.apply(p, x, s)
            lines.append("  " + moment_statistics(
                f"[output of {c.token[1:-1]}]", np.asarray(x)))
        return "\n".join(lines)

    def info_gradient(self, grads: ParamsList) -> str:
        lines = []
        for c, g in zip(self.components, grads):
            s = c.info_gradient(g)
            if s:
                lines.append(f"{c.token[1:-1]}:\n  {s}")
        return "\n".join(lines)

    # ------------------------------------------------------------------
    # serialization
    # ------------------------------------------------------------------
    def write(self, filename: str, params: ParamsList,
              binary: bool = True) -> None:
        kio.check_output_path(filename, "model file")
        with open(filename, "wb") as f:
            self.write_stream(f, params, binary)

    def write_stream(self, stream, params: ParamsList,
                     binary: bool = True) -> None:
        out = kio.KaldiOutput(stream, binary=binary)
        kio.write_token(out, "<Nnet>")
        if not binary:
            stream.write(b"\n")
        for c, p in zip(self.components, params):
            kio.write_token(out, c.token)
            kio.write_int32(out, c.output_dim)
            kio.write_int32(out, c.input_dim)
            c.write_data(out, p)
            if not binary:
                stream.write(b"\n")
        kio.write_token(out, "</Nnet>")
        if not binary:
            stream.write(b"\n")

    @classmethod
    def read(cls, filename: str) -> tuple["Nnet", ParamsList]:
        with open(filename, "rb") as f:
            return cls.read_stream(io.BufferedReader(
                io.FileIO(f.fileno(), closefd=False)))

    @classmethod
    def read_stream(cls, stream) -> tuple["Nnet", ParamsList]:
        inp = kio.KaldiInput(stream)
        tok = kio.read_token(inp)
        if tok != "<Nnet>":
            raise ValueError(f"Nnet.read: expected <Nnet>, got {tok!r}")
        nnet = cls()
        params = []
        while True:
            tok = kio.read_token(inp)
            if tok == "</Nnet>":
                break
            if tok == "<!EndOfComponent>":
                continue
            out_dim = kio.read_int32(inp)
            in_dim = kio.read_int32(inp)
            c = comp.component_from_token(tok, in_dim, out_dim)
            params.append(c.read_data(inp))
            nnet.append(c)
        return nnet, tuple(params)

    # ------------------------------------------------------------------
    # proto init (nnet-initialize equivalent, SURVEY.md §3.3)
    # ------------------------------------------------------------------
    @classmethod
    def init_from_proto(cls, proto_text: str,
                        rng: jax.Array) -> tuple["Nnet", ParamsList]:
        """Parse an `<NnetProto>` topology description, e.g.

            <NnetProto>
            <Transmit> <InputDim> 40 <OutputDim> 40
            <LstmProjectedStreams> <InputDim> 40 <OutputDim> 512 \
                <CellDim> 800 <ParamScale> 0.01 <NumStream> 4
            ...
            </NnetProto>
        """
        nnet = cls()
        params = []
        lines = [ln.strip() for ln in proto_text.splitlines() if ln.strip()]
        rngs = jax.random.split(rng, max(len(lines), 1))
        for line, k in zip(lines, rngs):
            if line in ("<NnetProto>", "</NnetProto>"):
                continue
            toks = line.split()
            marker = toks[0]
            opts: dict[str, str] = {}
            i = 1
            while i + 1 < len(toks) + 1 and i < len(toks):
                if toks[i].startswith("<") and i + 1 < len(toks):
                    opts[toks[i]] = toks[i + 1]
                    i += 2
                else:
                    i += 1
            in_dim = int(opts.pop("<InputDim>"))
            out_dim = int(opts.pop("<OutputDim>"))
            c = comp.component_from_token(marker, in_dim, out_dim)
            params.append(c.init_from_config(opts, k))
            nnet.append(c)
        return nnet, tuple(params)

    # ------------------------------------------------------------------
    # model surgery helpers (README.md Q1/Q2 text-level editing, done
    # natively here)
    # ------------------------------------------------------------------
    def to_standard(self) -> "Nnet":
        """Convert a google-style net (Transmit + LstmProjectedStreams) to
        the standard decode form (TimeShift + LstmProjected) as described
        in /root/reference/README.md:17-30. Parameters are unchanged
        (LstmParams pytrees are layout-identical)."""
        out = Nnet()
        for c in self.components:
            if isinstance(c, comp.Transmit):
                ts = comp.TimeShift(c.input_dim, c.output_dim)
                out.append(ts)
            elif isinstance(c, comp.LstmProjectedStreams):
                lp = comp.LstmProjected(c.input_dim, c.output_dim,
                                        cell_dim=c.cell_dim,
                                        param_scale=c.param_scale)
                lp.dropout_rate = c.dropout_rate
                out.append(lp)
            else:
                out.append(c)
        return out

    def to_streams(self) -> "Nnet":
        """Inverse of `to_standard`: TimeShift -> Transmit (the shift is
        the caller's to reapply, e.g. as streaming lookahead) and
        LstmProjected -> LstmProjectedStreams so state carries across
        chunks. Parameters are unchanged (layout-identical pytrees)."""
        out = Nnet()
        for c in self.components:
            if isinstance(c, comp.TimeShift):
                out.append(comp.Transmit(c.input_dim, c.output_dim))
            elif isinstance(c, comp.LstmProjected) and \
                    not isinstance(c, comp.LstmProjectedStreams):
                ls = comp.LstmProjectedStreams(
                    c.input_dim, c.output_dim, cell_dim=c.cell_dim,
                    param_scale=c.param_scale)
                ls.dropout_rate = c.dropout_rate
                out.append(ls)
            else:
                out.append(c)
        return out
