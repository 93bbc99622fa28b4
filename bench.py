"""Benchmark: audio-seconds of speech processed per wall-second per chip
in multi-stream truncated-BPTT training (the BASELINE.json north-star
metric; the reference reports the same quantity as "frames per second",
bd-nnet-train-lstm-streams.cc:263-267, at 100 frames/audio-second).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "spread": N, "details": {...}}

* value: median-of-repeats full training-step throughput (fwd + BPTT +
  update) of the flagship model (40 -> LSTMP 800c/512r -> 8000 senones)
  at the best measured configuration.
* spread: (max - min) / median across the headline repeats — the axon
  tunnel carries run-to-run variance, so the median plus spread is what
  makes the number defensible (BENCH_NOTES "Measurement methodology").
* vs_baseline: speedup over the same step at the reference's original
  configuration S=4 streams (google/train_lstm_streams.sh:6) — the
  reference's own batching on this chip. The reference publishes no
  absolute numbers (BASELINE.md), so the baseline is measured, not quoted.
* details: per-config medians, including the deep BASELINE config 4
  (2x LSTMP -> 16624 senones) with the same grouped+bf16 treatment as
  the flagship.

Details for each config also go to stderr.
"""

import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.models.components import set_matmul_dtype
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, make_train_step
from kaldi_lstm_tpu.train.trainer import make_grouped_train_step

FRAMES_PER_AUDIO_SECOND = 100.0  # 10 ms frame shift
T = 20  # Tbptt=20 (google/train_lstm_streams.sh:7)

# Dense-matmul peak of the chip for MFU accounting (VERDICT r3 weak #6:
# the speed-of-light claim must be auditable). TPU v5e: 197 TFLOP/s
# bf16 (MXU native dtype). f32 matmuls run the MXU at roughly half that
# rate, so *_f32 MFU entries use a per-dtype peak (ADVICE r4) — without
# it the f32 numbers are understated and not comparable to the bf16
# rows. Override for other chips with KLT_PEAK_FLOPS[_F32].
PEAK_FLOPS = float(os.environ.get("KLT_PEAK_FLOPS", 197e12))
PEAK_FLOPS_F32 = float(os.environ.get("KLT_PEAK_FLOPS_F32",
                                      PEAK_FLOPS / 2))


def model_flops_per_frame(nnet, train=True) -> float:
    """Analytic matmul FLOPs per frame (one stream, one timestep): every
    GEMM counts 2*m*n; training counts 3x each (fwd + input-grad +
    weight-grad GEMM). Elementwise gate math, peepholes and the
    optimizer update are excluded — they are VPU work and do not count
    against the MXU peak. LSTMP per frame: input proj [I->4C],
    recurrent [R->4C], projection [C->R]
    (bd-nnet-lstm-projected-streams.h:246,275,312)."""
    fwd = 0.0
    for c in nnet.components:
        name = type(c).__name__
        if name in ("LstmProjectedStreams", "LstmProjected"):
            C, R, I = c.cell_dim, c.output_dim, c.input_dim
            fwd += 2.0 * (4 * C * I + 4 * C * R + R * C)
        elif name == "BLstm":
            C, R, I = c.cell_dim, c.output_dim // 2, c.input_dim
            fwd += 2 * 2.0 * (4 * C * I + 4 * C * R + R * C)
        elif name == "AffineTransform":
            fwd += 2.0 * c.input_dim * c.output_dim
    return fwd * (3.0 if train else 1.0)


def mfu(audio_s_per_s: float, flops_per_frame: float,
        peak: float = PEAK_FLOPS) -> float:
    return (audio_s_per_s * FRAMES_PER_AUDIO_SECOND * flops_per_frame
            / peak)

PROTO = """<NnetProto>
<Transmit> <InputDim> 40 <OutputDim> 40
<LstmProjectedStreams> <InputDim> 40 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> 4
<AffineTransform> <InputDim> 512 <OutputDim> 8000 <BiasMean> 0.0 <BiasRange> 0.0 <ParamStddev> 0.04
<Softmax> <InputDim> 8000 <OutputDim> 8000
</NnetProto>
"""

# BASELINE.json config 4: stacked 2-layer LSTMP into 16624 senones — the
# reference's own decode-example model (README.md:24-29,38-44)
PROTO_DEEP = """<NnetProto>
<Transmit> <InputDim> 40 <OutputDim> 40
<LstmProjectedStreams> <InputDim> 40 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> 4
<LstmProjectedStreams> <InputDim> 512 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> 4
<AffineTransform> <InputDim> 512 <OutputDim> 16624 <ParamStddev> 0.04
<Softmax> <InputDim> 16624 <OutputDim> 16624
</NnetProto>
"""


class Bench:
    """One compiled config; .run() times one pass so repeats share the
    compile and the steady-state buffers."""

    def __init__(self, nnet, params0, S, group=1, bf16=False):
        self.bf16 = bf16
        opts = TrainOptions(learn_rate=1e-5, momentum=0.9)
        if bf16:
            set_matmul_dtype(jnp.bfloat16)
        try:
            self.step = (make_grouped_train_step(nnet, opts) if group > 1
                         else make_train_step(nnet, opts))
        finally:
            if bf16:
                set_matmul_dtype(None)
        self.group = group
        self.S, nclass = S, nnet.output_dim
        self.params = jax.tree_util.tree_map(jnp.array, params0)
        self.opt = init_momentum(self.params)
        self.states = nnet.init_states(S)
        rng = np.random.RandomState(0)
        lead = (group,) if group > 1 else ()
        self.feats = jnp.asarray(rng.randn(*lead, S, T, 40), jnp.float32)
        self.ids = jnp.asarray(rng.randint(0, nclass, lead + (S, T, 1)),
                               jnp.int32)
        self.w = jnp.ones(lead + (S, T, 1), jnp.float32)
        self.mask = jnp.ones(lead + (S, T), jnp.float32)
        self.flags = jnp.zeros(lead + (S,), jnp.int32)
        self.lr = jnp.float32(1e-5)

    def _advance(self, n):
        for _ in range(n):
            (self.params, self.opt, self.states, _aux) = self.step(
                self.params, self.opt, self.states, (), self.feats,
                self.ids, self.w, self.mask, self.flags, self.lr)
        # the experimental axon platform's block_until_ready can return
        # before execution completes; a host copy of a value depending on
        # the whole chained computation cannot (steps chain via params)
        return float(jnp.sum(self.params[1].bias))

    def run(self, iters, warmup=0):
        if self.bf16:
            set_matmul_dtype(jnp.bfloat16)
        try:
            if warmup:
                self._advance(warmup)
            t0 = time.perf_counter()
            self._advance(iters)
            dt = time.perf_counter() - t0
        finally:
            if self.bf16:
                set_matmul_dtype(None)
        steps_per_s = iters * self.group / dt
        return steps_per_s * self.S * T / FRAMES_PER_AUDIO_SECOND


def measure(name, nnet, params, S, group=1, bf16=False, repeats=3,
            iters=None):
    """Median-of-repeats throughput for one config (VERDICT r1 weak #4:
    single-pass numbers carry +-20-30% tunnel variance)."""
    if iters is None:
        iters = 20 if group == 1 else max(1, 160 // group)
    b = Bench(nnet, params, S, group=group, bf16=bf16)
    b.run(1 if group > 1 else 3)  # compile + settle
    vals = [b.run(iters) for _ in range(repeats)]
    med = statistics.median(vals)
    spread = (max(vals) - min(vals)) / med if med else 0.0
    print(f"{name}: median {med:.1f} audio-s/s over {repeats}x{iters} "
          f"(spread {spread:.1%}, runs {[round(v, 1) for v in vals]})",
          file=sys.stderr, flush=True)
    return med, spread


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    details = {}
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))

    # reference configuration: S=4, Tbptt=20. Tiny steps are
    # tunnel-noise bound (23% spread in r03); 9 repeats + an explicit
    # indicative flag when the spread stays >5% (VERDICT r3 weak #5)
    base, base_spread = measure("reference config S=4", nnet, params, S=4,
                                repeats=9)
    details["reference_S4"] = round(base, 1)
    details["reference_S4_spread"] = round(base_spread, 4)
    details["reference_S4_indicative"] = base_spread > 0.05

    # stream-count sweep, per-dispatch (detail only; one pass each)
    best_S, best_sweep = 512, 0.0
    for S in (256, 512):
        med, _ = measure(f"per-dispatch S={S}", nnet, params, S=S,
                         repeats=1)
        details[f"per_dispatch_S{S}"] = round(med, 1)
        if med > best_sweep:
            best_sweep, best_S = med, S

    # grouped device step (--step-group 32) f32 and bf16; bf16 is
    # headline-eligible (convergence parity validated at flagship scale,
    # tools_dev/tpu_convergence_check.py: f32 55.9% vs bf16 55.9%)
    cand = {}
    med, spr = measure(f"grouped x32 S={best_S} f32", nnet, params,
                       S=best_S, group=32)
    details["grouped32_f32"] = round(med, 1)
    cand["grouped32_f32"] = (med, spr)
    med, spr = measure(f"grouped x32 S={best_S} bf16", nnet, params,
                       S=best_S, group=32, bf16=True)
    details["grouped32_bf16"] = round(med, 1)
    cand["grouped32_bf16"] = (med, spr)

    # deep BASELINE config 4 with the full treatment (VERDICT r1 weak #1)
    nnet_d, params_d = Nnet.init_from_proto(PROTO_DEEP, jax.random.PRNGKey(1))
    med, _ = measure("deep 2xLSTMP->16624 per-dispatch S=256 f32",
                     nnet_d, params_d, S=256, repeats=1)
    details["deep_per_dispatch_S256_f32"] = round(med, 1)
    med, _ = measure("deep 2xLSTMP->16624 grouped x32 S=512 bf16",
                     nnet_d, params_d, S=512, group=32, bf16=True)
    details["deep_grouped32_bf16"] = round(med, 1)

    # per-dispatch is normally dominated by the grouped step, but if a
    # backend inverts that, re-measure it with repeats so the headline
    # stays "best measured configuration"
    if best_sweep > max(v[0] for v in cand.values()):
        med, spr = measure(f"per-dispatch S={best_S} (headline check)",
                           nnet, params, S=best_S)
        cand[f"per_dispatch_S{best_S}"] = (med, spr)

    # MFU accounting (VERDICT r3 weak #6): analytic model FLOPs and the
    # fraction of chip peak each headline-class config achieves
    fpf = model_flops_per_frame(nnet)
    fpf_deep = model_flops_per_frame(nnet_d)
    details["model_flops_per_frame"] = fpf
    details["deep_model_flops_per_frame"] = fpf_deep
    details["peak_flops"] = PEAK_FLOPS
    details["peak_flops_f32"] = PEAK_FLOPS_F32
    for k, f in (("grouped32_bf16", fpf), ("grouped32_f32", fpf),
                 ("deep_grouped32_bf16", fpf_deep)):
        if k in details:
            # the "_f32" config is f32 STORAGE under JAX's default
            # matmul precision, which on TPU feeds the MXU bf16 inputs
            # (measured: it runs within ~4% of the explicit-bf16 config,
            # impossible for true-f32 arithmetic at half peak — against
            # the f32 peak its MFU computes to >1.0). So every config's
            # MFU is reported against the bf16 peak, and the f32 row is
            # labeled for what it is.
            details[k + "_mfu"] = round(mfu(details[k], f, PEAK_FLOPS), 4)
    if "grouped32_f32" in details:
        details["grouped32_f32_note"] = (
            "f32 storage, default-precision matmuls (bf16 MXU passes); "
            "MFU vs bf16 peak")

    name, (best, spread) = max(cand.items(), key=lambda kv: kv[1][0])
    best_mfu = mfu(best, fpf)
    print(f"headline: {name} — {best:.0f} audio-s/s/chip, "
          f"MFU {best_mfu:.1%} of {PEAK_FLOPS / 1e12:.0f} TFLOP/s peak",
          file=sys.stderr)
    print(json.dumps({
        "metric": "train_audio_seconds_per_s_per_chip",
        "value": round(best, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(best / base, 2),
        "spread": round(spread, 4),
        "mfu": round(best_mfu, 4),
        "details": details,
    }))


if __name__ == "__main__":
    main()
