"""The component (layer) system.

Functional re-design of nnet1's `Component`/`UpdatableComponent` virtual
API (SURVEY.md §2.2): a component object holds only *static* configuration
(dims, cell size, shift, ...); parameters and recurrent state are explicit
pytrees threaded through pure `apply` functions so the whole network jits
and shards. Serialization follows the Kaldi token format so checkpoints
cross-load with the reference (component markers, `<Token> out_dim in_dim`
headers, tensor order per bd-nnet-lstm-projected-streams.h:101-150).

Batch layout is stream-major [S, T, D].
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.io import kaldi_io as kio
from kaldi_lstm_tpu.ops.lstm_cell import (
    LstmParams,
    LstmState,
    init_lstm_params,
    lstm_scan,
    zero_state,
)

Params = Any   # component parameter pytree ({} when parameter-free)
State = Any    # recurrent state pytree (None when stateless)


class Moments:
    """Precomputed tensor moments for monitoring. The training monitor
    computes min/max/mean/std for EVERY buffer in one jitted device call
    and hands these tiny host scalars through the same
    info()/info_gradient() formatting paths — materializing each buffer
    eagerly (the naive route) costs a full D2H fetch per tensor, which
    on a tunneled device turns a monitoring dump into minutes."""

    __slots__ = ("shape", "min", "max", "mean", "std")

    def __init__(self, shape, mn, mx, mean, std):
        self.shape = tuple(shape)
        self.min, self.max = float(mn), float(mx)
        self.mean, self.std = float(mean), float(std)


def moment_statistics(name: str, arr) -> str:
    """Tensor moment summary for Info()/InfoGradient() monitoring, the
    equivalent of Kaldi's MomentStatistics (used at
    bd-nnet-lstm-projected-streams.h:190-210). Accepts an array or a
    precomputed `Moments`."""
    if isinstance(arr, Moments):
        if int(np.prod(arr.shape or (1,))) == 0:
            return f"{name} [empty]"
        return (f"{name} [dim {'x'.join(map(str, arr.shape))}] "
                f"min {arr.min:.6g} max {arr.max:.6g} "
                f"mean {arr.mean:.6g} stddev {arr.std:.6g}")
    a = np.asarray(arr)
    if a.size == 0:
        return f"{name} [empty]"
    return (f"{name} [dim {'x'.join(map(str, a.shape))}] "
            f"min {a.min():.6g} max {a.max():.6g} "
            f"mean {a.mean():.6g} stddev {a.std():.6g}")


class Component:
    """Base: static config + pure functions over explicit params/state."""

    token: str = ""
    updatable: bool = False
    stateful: bool = False
    # True when apply() treats the leading [S, T] axes as one flat batch
    # (elementwise / last-dim ops) — such components run unchanged under
    # the time-major ([T, S, .]) fast path of the fused train step.
    axis_invariant: bool = True

    def __init__(self, input_dim: int, output_dim: int):
        self.input_dim = int(input_dim)
        self.output_dim = int(output_dim)

    # --- numerics ---------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Params:
        return {}

    def apply(self, params: Params, x: jax.Array,
              state: State = None) -> tuple[jax.Array, State]:
        raise NotImplementedError

    def init_state(self, nstream: int) -> State:
        return None

    # --- serialization ----------------------------------------------------
    def read_data(self, inp: kio.KaldiInput) -> Params:
        return {}

    def write_data(self, out: kio.KaldiOutput, params: Params) -> None:
        pass

    def init_from_config(self, tokens: dict, rng: jax.Array) -> Params:
        """Build params from `<NnetProto>` line options (nnet-initialize)."""
        return self.init_params(rng)

    # --- monitoring -------------------------------------------------------
    def info(self, params: Params) -> str:
        return ""

    def info_gradient(self, grads: Params) -> str:
        return ""

    def num_params(self, params: Params) -> int:
        return sum(int(np.prod(np.shape(p)))
                   for p in jax.tree_util.tree_leaves(params))

    def __repr__(self):
        return (f"{type(self).__name__}(in={self.input_dim}, "
                f"out={self.output_dim})")


def _on_tpu() -> bool:
    """True when the default device is a TPU — including bridged
    platforms whose backend name is not 'tpu' (e.g. the axon tunnel,
    where default_backend() == 'axon' but the device is a TPU chip)."""
    if jax.default_backend() == "tpu":
        return True
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return "TPU" in getattr(dev, "device_kind", "")


# Global matmul compute dtype: None = full f32; jnp.bfloat16 runs the
# large GEMMs (senone affine, LSTM input projection) in bf16 with f32
# accumulation — ~2x MXU throughput, opt-in pending accuracy parity.
_MATMUL_DTYPE = None


def set_matmul_dtype(dtype) -> None:
    global _MATMUL_DTYPE
    _MATMUL_DTYPE = dtype


def get_matmul_dtype():
    return _MATMUL_DTYPE


_REGISTRY: dict[str, type] = {}


def register(cls):
    _REGISTRY[cls.token] = cls
    return cls


def component_from_token(token: str, input_dim: int,
                         output_dim: int) -> Component:
    if token not in _REGISTRY:
        raise ValueError(f"unknown component marker {token!r}; known: "
                         f"{sorted(_REGISTRY)}")
    return _REGISTRY[token](input_dim, output_dim)


# ---------------------------------------------------------------------------
# simple pass-through / shift components
# ---------------------------------------------------------------------------

@register
class Transmit(Component):
    """Identity placeholder; leading non-updatable component in multi-stream
    nets (reference standard/nnet/nnet-transmit-component.h:27-34, rationale
    in /root/reference/README.md Q3)."""

    token = "<Transmit>"

    def apply(self, params, x, state=None):
        return x, state


@register
class TimeShift(Component):
    """Target-delay at decode: out[t] = in[clamp(t + shift)] along time,
    with edge clamping (standard/nnet/nnet-time-shift.h:42-51). No gradient
    use-case (decode-only)."""

    token = "<TimeShift>"
    axis_invariant = False

    def __init__(self, input_dim, output_dim, shift: int = 0):
        super().__init__(input_dim, output_dim)
        self.shift = int(shift)

    def apply(self, params, x, state=None):
        T = x.shape[1]
        src = jnp.clip(jnp.arange(T) + self.shift, 0, T - 1)
        return x[:, src, :], state

    def read_data(self, inp):
        tok = kio.read_token(inp)
        if tok != "<Shift>":
            raise ValueError(f"TimeShift: expected <Shift>, got {tok!r}")
        self.shift = kio.read_int32(inp)
        return {}

    def write_data(self, out, params):
        kio.write_token(out, "<Shift>")
        kio.write_int32(out, self.shift)
        if not out.binary:
            out.stream.write(b"\n")

    def init_from_config(self, tokens, rng):
        self.shift = int(tokens.get("<Shift>", 0))
        return {}


@register
class AddShift(Component):
    """Per-dim additive shift (CMVN mean subtraction in the feature
    transform, google/feature_transform.nnet.txt:2-3)."""

    token = "<AddShift>"

    def init_params(self, rng):
        return {"shift": jnp.zeros((self.input_dim,), jnp.float32)}

    def apply(self, params, x, state=None):
        return x + params["shift"], state

    def read_data(self, inp):
        # tolerate the newer-nnet1 optional <LearnRateCoef>
        if kio.peek_token(inp.stream) == "<LearnRateCoef>":
            kio.read_token(inp)
            kio.read_float(inp)
        return {"shift": jnp.asarray(kio.read_vector(inp))}

    def write_data(self, out, params):
        kio.write_vector(out, np.asarray(params["shift"]))

    def info(self, params):
        return moment_statistics("shift", params["shift"])


@register
class Rescale(Component):
    """Per-dim multiplicative rescale (CMVN 1/std,
    google/feature_transform.nnet.txt:4-5)."""

    token = "<Rescale>"

    def init_params(self, rng):
        return {"scale": jnp.ones((self.input_dim,), jnp.float32)}

    def apply(self, params, x, state=None):
        return x * params["scale"], state

    def read_data(self, inp):
        if kio.peek_token(inp.stream) == "<LearnRateCoef>":
            kio.read_token(inp)
            kio.read_float(inp)
        return {"scale": jnp.asarray(kio.read_vector(inp))}

    def write_data(self, out, params):
        kio.write_vector(out, np.asarray(params["scale"]))

    def info(self, params):
        return moment_statistics("scale", params["scale"])


# ---------------------------------------------------------------------------
# affine / softmax
# ---------------------------------------------------------------------------

@register
class Splice(Component):
    """Frame splicing over a context window (upstream nnet-various.h):
    out[t] = concat(in[clamp(t + off)] for off in build_vector). The DNN
    feature-transform counterpart of the LSTM's TimeShift."""

    axis_invariant = False
    token = "<Splice>"

    def __init__(self, input_dim, output_dim, offsets=None):
        super().__init__(input_dim, output_dim)
        self.offsets = list(offsets) if offsets is not None else []

    def apply(self, params, x, state=None):
        T = x.shape[1]
        cols = []
        for off in self.offsets:
            src = jnp.clip(jnp.arange(T) + off, 0, T - 1)
            cols.append(x[:, src, :])
        return jnp.concatenate(cols, axis=-1), state

    def read_data(self, inp):
        # Kaldi writes the offsets as an integer vector "[ -2 -1 0 1 2 ]"
        # (text) / int-vector (binary)
        from kaldi_lstm_tpu.io.kaldi_io import read_int_vector
        if inp.binary:
            self.offsets = [int(v) for v in read_int_vector(inp)]
        else:
            tok = kio.read_token(inp)
            if tok != "[":
                raise ValueError("Splice: expected '['")
            self.offsets = []
            while True:
                tok = kio.read_token(inp)
                if tok == "]":
                    break
                self.offsets.append(int(tok))
        return {}

    def write_data(self, out, params):
        from kaldi_lstm_tpu.io.kaldi_io import write_int_vector
        if out.binary:
            write_int_vector(out, np.asarray(self.offsets, np.int32))
        else:
            out.stream.write(b"[ " + " ".join(
                str(o) for o in self.offsets).encode() + b" ]\n")

    def init_from_config(self, tokens, rng):
        if "<BuildVector>" in tokens:
            self.offsets = [int(v) for v in
                            tokens["<BuildVector>"].split(":")]
        else:
            left = int(tokens.get("<LeftContext>", 0))
            right = int(tokens.get("<RightContext>", 0))
            self.offsets = list(range(-left, right + 1))
        return {}


@register
class Sigmoid(Component):
    """Element-wise logistic activation (upstream nnet-activation.h)."""

    token = "<Sigmoid>"

    def apply(self, params, x, state=None):
        return jax.nn.sigmoid(x), state


@register
class Tanh(Component):
    token = "<Tanh>"

    def apply(self, params, x, state=None):
        return jnp.tanh(x), state


@register
class LogSoftmax(Component):
    """Row log-softmax (upstream nnet-activation.h LogSoftmax) — nets
    whose decoder wants log posteriors directly."""

    token = "<LogSoftmax>"

    def apply(self, params, x, state=None):
        if x.ndim > 2:  # 2-D rows: see Softmax.apply
            shape = x.shape
            y = jax.nn.log_softmax(x.reshape(-1, shape[-1]), axis=-1)
            return y.reshape(shape), state
        return jax.nn.log_softmax(x, axis=-1), state


@register
class Dropout(Component):
    """Standalone dropout (upstream nnet-various.h Dropout) for DNN
    stacks: inverted dropout in training (keep-mask / retention), exact
    identity at test time — no nnet-copy surgery needed before decoding.
    Reads either <DropoutRate> or upstream's <DropoutRetention>."""

    token = "<Dropout>"
    uses_rng = True
    axis_invariant = True

    def __init__(self, input_dim, output_dim, dropout_rate: float = 0.5):
        super().__init__(input_dim, output_dim)
        self.dropout_rate = float(dropout_rate)

    def apply(self, params, x, state=None, rng=None, train=False):
        keep = 1.0 - self.dropout_rate
        if not train or rng is None or self.dropout_rate <= 0.0:
            return x, state
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return x * mask.astype(x.dtype) / keep, state

    def read_data(self, inp):
        tok = kio.peek_token(inp.stream)
        if tok == "<DropoutRate>":
            kio.read_token(inp)
            self.dropout_rate = kio.read_float(inp)
        elif tok == "<DropoutRetention>":
            kio.read_token(inp)
            self.dropout_rate = 1.0 - kio.read_float(inp)
        return {}

    def write_data(self, out, params):
        kio.write_token(out, "<DropoutRate>")
        kio.write_float(out, self.dropout_rate)
        if not out.binary:
            out.stream.write(b"\n")

    def init_from_config(self, tokens, rng):
        if "<DropoutRetention>" in tokens:
            self.dropout_rate = 1.0 - float(tokens["<DropoutRetention>"])
        else:
            self.dropout_rate = float(tokens.get("<DropoutRate>", 0.5))
        return {}


@register
class AffineTransform(Component):
    """y = x W^T + b with W [out, in] (Kaldi orientation). The 16k-senone
    output layer of the reference nets (/root/reference/README.md:27)."""

    token = "<AffineTransform>"
    updatable = True

    def __init__(self, input_dim, output_dim):
        super().__init__(input_dim, output_dim)
        self.learn_rate_coef = 1.0
        self.bias_learn_rate_coef = 1.0
        self.max_norm = 0.0

    def init_params(self, rng, param_stddev: float = 0.1,
                    bias_mean: float = 0.0, bias_range: float = 0.0):
        k1, k2 = jax.random.split(rng)
        w = jax.random.normal(
            k1, (self.output_dim, self.input_dim), jnp.float32) * param_stddev
        b = bias_mean + (jax.random.uniform(k2, (self.output_dim,),
                                            jnp.float32) - 0.5) * bias_range
        return {"linearity": w, "bias": b}

    def apply(self, params, x, state=None):
        w = params["linearity"]
        if _MATMUL_DTYPE is not None:
            x_c, w_c = x.astype(_MATMUL_DTYPE), w.astype(_MATMUL_DTYPE)
        else:
            x_c, w_c = x, w
        # one flat [S*T, in] x [in, out] GEMM: XLA lowers the 3-D
        # [S, T, in] form to a far slower program on v5e at senone widths
        # (tools_dev/debug_tail5.py); reshapes are free
        shape = x.shape
        if x.ndim > 2:
            x_c = x_c.reshape(-1, shape[-1])
        y = jnp.dot(x_c, w_c.T,
                    preferred_element_type=jnp.float32) + params["bias"]
        if x.ndim > 2:
            y = y.reshape(*shape[:-1], y.shape[-1])
        return y, state

    def read_data(self, inp):
        while kio.peek_token(inp.stream) in ("<LearnRateCoef>",
                                             "<BiasLearnRateCoef>",
                                             "<MaxNorm>"):
            tok = kio.read_token(inp)
            val = kio.read_float(inp)
            if tok == "<LearnRateCoef>":
                self.learn_rate_coef = val
            elif tok == "<BiasLearnRateCoef>":
                self.bias_learn_rate_coef = val
            else:
                self.max_norm = val
        w = kio.read_matrix(inp)
        b = kio.read_vector(inp)
        return {"linearity": jnp.asarray(w), "bias": jnp.asarray(b)}

    def write_data(self, out, params):
        kio.write_token(out, "<LearnRateCoef>")
        kio.write_float(out, self.learn_rate_coef)
        kio.write_token(out, "<BiasLearnRateCoef>")
        kio.write_float(out, self.bias_learn_rate_coef)
        kio.write_token(out, "<MaxNorm>")
        kio.write_float(out, self.max_norm)
        kio.write_matrix(out, np.asarray(params["linearity"]))
        kio.write_vector(out, np.asarray(params["bias"]))

    def init_from_config(self, tokens, rng):
        # upstream nnet1 AffineTransform::InitData also accepts these
        self.learn_rate_coef = float(tokens.get("<LearnRateCoef>", 1.0))
        self.bias_learn_rate_coef = float(
            tokens.get("<BiasLearnRateCoef>", 1.0))
        self.max_norm = float(tokens.get("<MaxNorm>", 0.0))
        return self.init_params(
            rng,
            param_stddev=float(tokens.get("<ParamStddev>", 0.1)),
            bias_mean=float(tokens.get("<BiasMean>", 0.0)),
            bias_range=float(tokens.get("<BiasRange>", 0.0)),
        )

    def info(self, params):
        return (moment_statistics("linearity", params["linearity"]) + "\n  "
                + moment_statistics("bias", params["bias"]))

    def info_gradient(self, grads):
        return (moment_statistics("linearity_grad", grads["linearity"])
                + "\n  " + moment_statistics("bias_grad", grads["bias"]))


@register
class Softmax(Component):
    """Row softmax. In training the loss consumes pre-softmax logits via
    `Nnet.propagate(..., logits=True)` and jax.grad reproduces the combined
    softmax+xent derivative (y - t) that nnet1 gets by pairing
    Softmax::BackpropagateFnc with Xent (nnet-loss.cc:103-107)."""

    token = "<Softmax>"

    def apply(self, params, x, state=None):
        # Flatten to rows first: XLA's softmax over the last axis of a
        # 3-D [S, T, K] tensor is ~20x slower than the same rows as 2-D
        # [S*T, K] on v5e (335 ms vs 16 ms at [512, 100, 8000] —
        # tools_dev/debug_tail5.py); reshapes are free.
        if x.ndim > 2:
            shape = x.shape
            y = jax.nn.softmax(x.reshape(-1, shape[-1]), axis=-1)
            return y.reshape(shape), state
        return jax.nn.softmax(x, axis=-1), state


# ---------------------------------------------------------------------------
# projected LSTM components
# ---------------------------------------------------------------------------

class _LstmBase(Component):
    updatable = True
    axis_invariant = False
    # apply() accepts input_grad=False: skip the dx computation in the
    # Pallas backward when the layer's input needs no gradient (first
    # layer over the feature batch)
    accepts_input_grad_flag = True
    # apply() accepts time_major=True ([T, S, .] in/out) — used by the
    # fused train step to run the whole trunk in the kernels' native
    # layout with no big-tensor transposes
    supports_time_major = True

    def __init__(self, input_dim, output_dim, cell_dim: int = 0,
                 param_scale: float = 0.02):
        super().__init__(input_dim, output_dim)
        self.cell_dim = int(cell_dim)
        self.recur_dim = int(output_dim)
        self.param_scale = float(param_scale)
        self.cell_clip = 50.0  # bd-nnet-lstm-projected-streams.h:296-297
        # newer-nnet1 <LearnRateCoef>: per-component LR multiplier
        # (0 freezes the layer — the FAQ Q2 stacking flow trains the
        # inserted layer against frozen pretrained features)
        self.learn_rate_coef = 1.0
        # "auto": fused Pallas kernel on TPU, lax.scan elsewhere
        self.impl = "auto"
        # forward-connection dropout on the gate pre-activations —
        # implemented properly (inverted dropout) where the reference
        # leaves it commented out (README.md Q4)
        self.dropout_rate = 0.0

    uses_rng = True

    def _dropout_mask(self, rng, x):
        """Bool KEEP mask [*, *, 4C] (iid, layout-shaped); None when
        dropout is off."""
        if self.dropout_rate <= 0.0 or rng is None:
            return None
        keep = 1.0 - self.dropout_rate
        d0, d1, _ = x.shape  # [S,T] or [T,S]
        return jax.random.bernoulli(rng, keep,
                                    (d0, d1, 4 * self.cell_dim))

    def _run_scan(self, params, x, state, dropout_mask=None,
                  time_major=False, input_grad=True, advance_mask=None):
        keep = 1.0 - self.dropout_rate
        # Measured on v5e (tools_dev/bench_ab_impl.py): the fused Pallas
        # kernels win both training (in-VMEM weight-grad accumulation in
        # the backward — 4.22 vs 4.52 ms/step full model at S=256) and
        # inference forward (~1.5x). KLT_LSTM_IMPL=scan|pallas overrides
        # for A/B runs.
        import os
        impl = os.environ.get("KLT_LSTM_IMPL", self.impl)
        if impl == "auto":
            impl = "pallas" if _on_tpu() else "scan"
        if advance_mask is not None:
            # per-frame state gating (heterogeneous-arrival serving) is
            # implemented in the scan path only; serving chunk ticks are
            # transport-bound, not kernel-bound (BENCH_NOTES round 4)
            impl = "scan"
        if impl == "pallas":
            from kaldi_lstm_tpu.ops.lstm_pallas import lstm_scan_pallas
            return lstm_scan_pallas(params, x, state, self.cell_clip,
                                    time_major=time_major,
                                    gate_keep_mask=dropout_mask,
                                    keep_prob=keep,
                                    need_input_grad=input_grad)
        gate_mult = None if dropout_mask is None else \
            dropout_mask.astype(x.dtype) / keep
        # honor the global matmul dtype in the scan fallback too (the
        # same bf16 contract as the Pallas kernels, see lstm_cell)
        return lstm_scan(params, x, state, self.cell_clip,
                         compute_dtype=get_matmul_dtype(),
                         gate_dropout_mask=gate_mult,
                         time_major=time_major,
                         advance_mask=advance_mask)

    def init_params(self, rng) -> LstmParams:
        return init_lstm_params(rng, self.input_dim, self.cell_dim,
                                self.recur_dim, self.param_scale)

    def _read_tensors(self, inp) -> LstmParams:
        return LstmParams(
            w_gifo_x=jnp.asarray(kio.read_matrix(inp)),
            w_gifo_r=jnp.asarray(kio.read_matrix(inp)),
            bias=jnp.asarray(kio.read_vector(inp)),
            peephole_i_c=jnp.asarray(kio.read_vector(inp)),
            peephole_f_c=jnp.asarray(kio.read_vector(inp)),
            peephole_o_c=jnp.asarray(kio.read_vector(inp)),
            w_r_m=jnp.asarray(kio.read_matrix(inp)),
        )

    def _write_tensors(self, out, p: LstmParams) -> None:
        kio.write_matrix(out, np.asarray(p.w_gifo_x))
        kio.write_matrix(out, np.asarray(p.w_gifo_r))
        kio.write_vector(out, np.asarray(p.bias))
        kio.write_vector(out, np.asarray(p.peephole_i_c))
        kio.write_vector(out, np.asarray(p.peephole_f_c))
        kio.write_vector(out, np.asarray(p.peephole_o_c))
        kio.write_matrix(out, np.asarray(p.w_r_m))

    def info(self, p: LstmParams):
        return "\n  ".join([
            moment_statistics("w_gifo_x_", p.w_gifo_x),
            moment_statistics("w_gifo_r_", p.w_gifo_r),
            moment_statistics("bias_", p.bias),
            moment_statistics("peephole_i_c_", p.peephole_i_c),
            moment_statistics("peephole_f_c_", p.peephole_f_c),
            moment_statistics("peephole_o_c_", p.peephole_o_c),
            moment_statistics("w_r_m_", p.w_r_m),
        ])

    def info_gradient(self, g: LstmParams):
        return "\n  ".join([
            moment_statistics("w_gifo_x_corr_", g.w_gifo_x),
            moment_statistics("w_gifo_r_corr_", g.w_gifo_r),
            moment_statistics("bias_corr_", g.bias),
            moment_statistics("peephole_i_c_corr_", g.peephole_i_c),
            moment_statistics("peephole_f_c_corr_", g.peephole_f_c),
            moment_statistics("peephole_o_c_corr_", g.peephole_o_c),
            moment_statistics("w_r_m_corr_", g.w_r_m),
        ])


@register
class LstmProjected(_LstmBase):
    """Single-sequence LSTMP: each call covers a whole utterance with zero
    initial state, no carry (standard/nnet/nnet-lstm-projected.h:222-231,
    state bridging explicitly disabled at decode)."""

    token = "<LstmProjected>"

    def apply(self, params: LstmParams, x, state=None, rng=None,
              train=False, time_major=False, input_grad=True):
        S = x.shape[1] if time_major else x.shape[0]
        st = zero_state(S, self.cell_dim, self.recur_dim, x.dtype)
        mask = self._dropout_mask(rng, x) if train else None
        out, _ = self._run_scan(params, x, st, mask,
                                time_major=time_major,
                                input_grad=input_grad)
        return out, None

    def read_data(self, inp):
        tok = kio.read_token(inp)
        if tok != "<CellDim>":
            raise ValueError(f"LstmProjected: expected <CellDim>, got {tok!r}")
        self.cell_dim = kio.read_int32(inp)
        while kio.peek_token(inp.stream) in ("<DropoutRate>",
                                             "<LearnRateCoef>"):
            tok = kio.read_token(inp)
            val = kio.read_float(inp)
            if tok == "<DropoutRate>":
                self.dropout_rate = val
            else:
                self.learn_rate_coef = val
        return self._read_tensors(inp)

    def write_data(self, out, params):
        kio.write_token(out, "<CellDim>")
        kio.write_int32(out, self.cell_dim)
        if self.dropout_rate > 0:
            kio.write_token(out, "<DropoutRate>")
            kio.write_float(out, self.dropout_rate)
        if self.learn_rate_coef != 1.0:
            kio.write_token(out, "<LearnRateCoef>")
            kio.write_float(out, self.learn_rate_coef)
        self._write_tensors(out, params)

    def init_from_config(self, tokens, rng):
        self.cell_dim = int(tokens["<CellDim>"])
        self.param_scale = float(tokens.get("<ParamScale>", 0.02))
        self.dropout_rate = float(tokens.get("<DropoutRate>", 0.0))
        self.learn_rate_coef = float(tokens.get("<LearnRateCoef>", 1.0))
        return self.init_params(rng)


@register
class LstmProjectedStreams(_LstmBase):
    """Multi-stream LSTMP with cross-chunk state carry. The carried (c, r)
    state is functional: `apply` takes and returns it; per-stream resets
    are a mask-multiply on the carry applied by the trainer *before* the
    chunk (the reference's Nnet::Reset ordering,
    bd-nnet-train-lstm-streams.cc:209 → …streams.h:212-220)."""

    token = "<LstmProjectedStreams>"
    stateful = True

    def __init__(self, input_dim, output_dim, cell_dim: int = 0,
                 nstream: int = 4, param_scale: float = 0.02):
        super().__init__(input_dim, output_dim, cell_dim, param_scale)
        self.nstream = int(nstream)

    def init_state(self, nstream: int) -> LstmState:
        return zero_state(nstream, self.cell_dim, self.recur_dim)

    def apply(self, params: LstmParams, x, state: Optional[LstmState] = None,
              rng=None, train=False, time_major=False, input_grad=True,
              advance_mask=None):
        if state is None:
            nstream = x.shape[1] if time_major else x.shape[0]
            state = zero_state(nstream, self.cell_dim, self.recur_dim,
                               x.dtype)
        mask = self._dropout_mask(rng, x) if train else None
        out, new_state = self._run_scan(params, x, state, mask,
                                        time_major=time_major,
                                        input_grad=input_grad,
                                        advance_mask=advance_mask)
        return out, new_state

    def read_data(self, inp):
        tok = kio.read_token(inp)
        if tok != "<CellDim>":
            raise ValueError(
                f"LstmProjectedStreams: expected <CellDim>, got {tok!r}")
        self.cell_dim = kio.read_int32(inp)
        tok = kio.read_token(inp)
        if tok != "<NumStream>":
            raise ValueError(
                f"LstmProjectedStreams: expected <NumStream>, got {tok!r}")
        self.nstream = kio.read_int32(inp)
        while kio.peek_token(inp.stream) in ("<DropoutRate>",
                                             "<LearnRateCoef>"):
            tok = kio.read_token(inp)
            val = kio.read_float(inp)
            if tok == "<DropoutRate>":
                self.dropout_rate = val
            else:
                self.learn_rate_coef = val
        return self._read_tensors(inp)

    def write_data(self, out, params):
        kio.write_token(out, "<CellDim>")
        kio.write_int32(out, self.cell_dim)
        kio.write_token(out, "<NumStream>")
        kio.write_int32(out, self.nstream)
        if self.dropout_rate > 0:
            kio.write_token(out, "<DropoutRate>")
            kio.write_float(out, self.dropout_rate)
        if self.learn_rate_coef != 1.0:
            kio.write_token(out, "<LearnRateCoef>")
            kio.write_float(out, self.learn_rate_coef)
        self._write_tensors(out, params)

    def init_from_config(self, tokens, rng):
        self.cell_dim = int(tokens["<CellDim>"])
        self.nstream = int(tokens.get("<NumStream>", 4))
        self.param_scale = float(tokens.get("<ParamScale>", 0.02))
        self.dropout_rate = float(tokens.get("<DropoutRate>", 0.0))
        self.learn_rate_coef = float(tokens.get("<LearnRateCoef>", 1.0))
        return self.init_params(rng)


@register
class BLstmProjectedStreams(_LstmBase):
    """Bidirectional projected LSTM: independent forward and backward
    cells over the whole chunk, outputs concatenated (output_dim = 2R).
    The reference lists BLSTM as its TODO (standard/README.md); upstream
    nnet1 later grew the same component. No cross-chunk state carry —
    the backward direction needs the full future context, so each call
    covers a complete utterance (per-utterance training / decode)."""

    token = "<BLstmProjectedStreams>"

    def __init__(self, input_dim, output_dim, cell_dim: int = 0,
                 nstream: int = 4, param_scale: float = 0.02):
        super().__init__(input_dim, output_dim, cell_dim, param_scale)
        self.recur_dim = int(output_dim) // 2
        self.nstream = int(nstream)

    def init_params(self, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "fw": init_lstm_params(k1, self.input_dim, self.cell_dim,
                                   self.recur_dim, self.param_scale),
            "bw": init_lstm_params(k2, self.input_dim, self.cell_dim,
                                   self.recur_dim, self.param_scale),
        }

    def apply(self, params, x, state=None, rng=None, train=False,
              time_major=False, input_grad=True):
        taxis = 0 if time_major else 1
        S = x.shape[1] if time_major else x.shape[0]
        st = zero_state(S, self.cell_dim, self.recur_dim, x.dtype)
        m_f = m_b = None
        if train and rng is not None and self.dropout_rate > 0:
            rf, rb = jax.random.split(rng)
            m_f = self._dropout_mask(rf, x)
            m_b = self._dropout_mask(rb, x)
        x_rev = jnp.flip(x, axis=taxis)
        out_f, _ = self._run_scan(params["fw"], x, st, m_f,
                                  time_major=time_major,
                                  input_grad=input_grad)
        out_b, _ = self._run_scan(params["bw"], x_rev, st,
                                  None if m_b is None else
                                  jnp.flip(m_b, axis=taxis),
                                  time_major=time_major,
                                  input_grad=input_grad)
        return jnp.concatenate([out_f, jnp.flip(out_b, axis=taxis)],
                               axis=-1), None

    def read_data(self, inp):
        tok = kio.read_token(inp)
        if tok != "<CellDim>":
            raise ValueError(
                f"BLstmProjectedStreams: expected <CellDim>, got {tok!r}")
        self.cell_dim = kio.read_int32(inp)
        tok = kio.read_token(inp)
        if tok != "<NumStream>":
            raise ValueError(
                f"BLstmProjectedStreams: expected <NumStream>, got {tok!r}")
        self.nstream = kio.read_int32(inp)
        return {"fw": self._read_tensors(inp),
                "bw": self._read_tensors(inp)}

    def write_data(self, out, params):
        kio.write_token(out, "<CellDim>")
        kio.write_int32(out, self.cell_dim)
        kio.write_token(out, "<NumStream>")
        kio.write_int32(out, self.nstream)
        self._write_tensors(out, params["fw"])
        self._write_tensors(out, params["bw"])

    def init_from_config(self, tokens, rng):
        self.cell_dim = int(tokens["<CellDim>"])
        self.nstream = int(tokens.get("<NumStream>", 4))
        self.param_scale = float(tokens.get("<ParamScale>", 0.02))
        return self.init_params(rng)

    def info(self, p):
        return ("forward:\n  " + super().info(p["fw"])
                + "\n  backward:\n  " + super().info(p["bw"]))

    def info_gradient(self, g):
        return ("forward:\n  " + super().info_gradient(g["fw"])
                + "\n  backward:\n  " + super().info_gradient(g["bw"]))
