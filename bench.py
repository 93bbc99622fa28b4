"""Benchmark: audio-seconds of speech processed per wall-second per chip
in multi-stream truncated-BPTT training (the BASELINE.json north-star
metric; the reference reports the same quantity as "frames per second",
bd-nnet-train-lstm-streams.cc:263-267, at 100 frames/audio-second).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

* value: full training-step throughput (fwd + BPTT + update) of the
  flagship model (40 -> LSTMP 800c/512r -> 8000 senones) at a TPU-sized
  stream count.
* vs_baseline: speedup over the same step at the reference's original
  configuration S=4 streams (google/train_lstm_streams.sh:6) — the
  reference's own batching on this chip. The reference publishes no
  absolute numbers (BASELINE.md), so the baseline is measured, not quoted.

Details for each config go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, make_train_step

FRAMES_PER_AUDIO_SECOND = 100.0  # 10 ms frame shift

PROTO = """<NnetProto>
<Transmit> <InputDim> 40 <OutputDim> 40
<LstmProjectedStreams> <InputDim> 40 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> 4
<AffineTransform> <InputDim> 512 <OutputDim> 8000 <BiasMean> 0.0 <BiasRange> 0.0 <ParamStddev> 0.04
<Softmax> <InputDim> 8000 <OutputDim> 8000
</NnetProto>
"""

# BASELINE.json config 4: stacked 2-layer LSTMP into 16624 senones
PROTO_DEEP = """<NnetProto>
<Transmit> <InputDim> 40 <OutputDim> 40
<LstmProjectedStreams> <InputDim> 40 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> 4
<LstmProjectedStreams> <InputDim> 512 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> 4
<AffineTransform> <InputDim> 512 <OutputDim> 16624 <ParamStddev> 0.04
<Softmax> <InputDim> 16624 <OutputDim> 16624
</NnetProto>
"""


def bench_config(nnet, params0, S, T, warmup=3, iters=20):
    """Measure steady-state steps/s of the jit'd train step."""
    opts = TrainOptions(learn_rate=1e-5, momentum=0.9)
    step = make_train_step(nnet, opts)
    params = jax.tree_util.tree_map(jnp.array, params0)
    opt = init_momentum(params)
    states = nnet.init_states(S)
    nclass = nnet.output_dim

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(S, T, 40), jnp.float32)
    ids = jnp.asarray(rng.randint(0, nclass, (S, T, 1)), jnp.int32)
    w = jnp.ones((S, T, 1), jnp.float32)
    mask = jnp.ones((S, T), jnp.float32)
    flags = jnp.zeros((S,), jnp.int32)
    lr = jnp.float32(1e-5)

    def host_sync():
        # the experimental axon platform's block_until_ready can return
        # before execution completes; a host copy of a value depending on
        # the whole chained computation cannot (steps chain via params)
        return float(jnp.sum(params[1].bias))

    for _ in range(warmup):
        params, opt, states, aux = step(params, opt, states, (), feats,
                                        ids, w, mask, flags, lr)
    host_sync()

    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, states, aux = step(params, opt, states, (), feats,
                                        ids, w, mask, flags, lr)
    host_sync()
    dt = time.perf_counter() - t0

    steps_per_s = iters / dt
    audio_s_per_step = S * T / FRAMES_PER_AUDIO_SECOND
    return steps_per_s * audio_s_per_step, steps_per_s


def bench_grouped(nnet, params0, S, T, group=8, warmup=1, iters=5):
    """The grouped device step (lax.scan over `group` staged batches per
    dispatch — tools CLI --step-group). Same math as bench_config; it
    amortizes the per-dispatch latency that costs ~25% of wall through
    the axon tunnel (BENCH_NOTES device attribution)."""
    from kaldi_lstm_tpu.train.trainer import make_grouped_train_step
    opts = TrainOptions(learn_rate=1e-5, momentum=0.9)
    gstep = make_grouped_train_step(nnet, opts)
    params = jax.tree_util.tree_map(jnp.array, params0)
    opt = init_momentum(params)
    states = nnet.init_states(S)
    nclass = nnet.output_dim
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(group, S, T, 40), jnp.float32)
    ids = jnp.asarray(rng.randint(0, nclass, (group, S, T, 1)), jnp.int32)
    w = jnp.ones((group, S, T, 1), jnp.float32)
    mask = jnp.ones((group, S, T), jnp.float32)
    flags = jnp.zeros((group, S), jnp.int32)
    lr = jnp.float32(1e-5)

    def host_sync():
        return float(jnp.sum(params[1].bias))

    for _ in range(warmup):
        params, opt, states, aux = gstep(params, opt, states, (), feats,
                                         ids, w, mask, flags, lr)
    host_sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, states, aux = gstep(params, opt, states, (), feats,
                                         ids, w, mask, flags, lr)
    host_sync()
    dt = time.perf_counter() - t0
    steps_per_s = iters * group / dt
    return steps_per_s * S * T / FRAMES_PER_AUDIO_SECOND, steps_per_s


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))

    # reference configuration: S=4, Tbptt=20
    base_tput, base_sps = bench_config(nnet, params, S=4, T=20)
    print(f"reference config S=4 T=20: {base_tput:.1f} audio-s/s "
          f"({base_sps:.1f} steps/s)", file=sys.stderr)

    # TPU-sized multi-stream batch
    best_tput, best_cfg = 0.0, None
    for S in (64, 128, 256, 512):
        tput, sps = bench_config(nnet, params, S=S, T=20)
        print(f"tpu config S={S} T=20: {tput:.1f} audio-s/s "
              f"({sps:.1f} steps/s)", file=sys.stderr)
        if tput > best_tput:
            best_tput, best_cfg = tput, S

    # BASELINE config 4: stacked 2-layer LSTMP into 16624 senones
    nnet_deep, params_deep = Nnet.init_from_proto(PROTO_DEEP,
                                                  jax.random.PRNGKey(1))
    tput_d, sps_d = bench_config(nnet_deep, params_deep, S=256, T=20)
    print(f"deep config (2xLSTMP -> 16624) S=256 T=20: {tput_d:.1f} "
          f"audio-s/s ({sps_d:.1f} steps/s)", file=sys.stderr)

    # grouped device step at the best stream count (--step-group path);
    # G=32 nearly saturates the device-busy bound (G sweep: x8 20.8k,
    # x16 22.8k, x32 23.8k audio-s/s)
    tput_g, sps_g = bench_grouped(nnet, params, S=best_cfg, T=20,
                                  group=32)
    print(f"grouped x32 S={best_cfg} T=20: {tput_g:.1f} audio-s/s "
          f"({sps_g:.1f} steps/s)", file=sys.stderr)
    if tput_g > best_tput:
        best_tput = tput_g

    # bf16-matmul grouped variant (--bf16 true --step-group 32): eligible
    # for the headline — convergence parity validated at flagship scale
    # on-chip (tools_dev/tpu_convergence_check.py: f32 55.9% vs bf16
    # 55.9% frame accuracy after 2000 steps)
    from kaldi_lstm_tpu.models.components import set_matmul_dtype
    set_matmul_dtype(jnp.bfloat16)
    try:
        tput16, sps16 = bench_grouped(nnet, params, S=best_cfg, T=20,
                                      group=32)
        print(f"bf16 grouped x32 S={best_cfg} T=20: {tput16:.1f} "
              f"audio-s/s ({sps16:.1f} steps/s)", file=sys.stderr)
    finally:
        set_matmul_dtype(None)
    if tput16 > best_tput:
        best_tput = tput16

    print(f"best: S={best_cfg}", file=sys.stderr)
    print(json.dumps({
        "metric": "train_audio_seconds_per_s_per_chip",
        "value": round(best_tput, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(best_tput / base_tput, 2),
    }))


if __name__ == "__main__":
    main()
