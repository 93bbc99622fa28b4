"""Forward AM-scoring throughput (BASELINE.json config 1 + batched
serving): whole-utterance feedforward of the standard-variant net
(TimeShift -> LstmProjected -> Affine -> Softmax), zero initial state —
the nnet-forward decode path (SURVEY.md §3.2).

Reports single-utterance latency/RTF and batched scoring throughput.

    python tools_dev/bench_forward.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.models import Nnet

FRAMES_PER_AUDIO_SECOND = 100.0

PROTO = """<NnetProto>
<TimeShift> <InputDim> 40 <OutputDim> 40 <Shift> 5
<LstmProjected> <InputDim> 40 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01
<AffineTransform> <InputDim> 512 <OutputDim> 8000 <ParamStddev> 0.04
<Softmax> <InputDim> 8000 <OutputDim> 8000
</NnetProto>
"""


def bench(nnet, params, S, T, warmup=2, iters=20):
    @jax.jit
    def fwd(params, x):
        return nnet.feedforward(params, x)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(S, T, 40), jnp.float32)
    y = fwd(params, x)
    jax.block_until_ready(y)
    # chain iterations through a data dependency so the axon platform
    # cannot skip unconsumed results (CLAUDE.md benchmarking rule)
    for _ in range(warmup):
        x = x + 1e-9 * jnp.sum(fwd(params, x)[..., :1])
    float(jnp.sum(x[0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = x + 1e-9 * jnp.sum(fwd(params, x)[..., :1])
    float(jnp.sum(x[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    audio_s = S * T / FRAMES_PER_AUDIO_SECOND
    return dt, audio_s / dt


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(jnp.array, params)

    # config 1: one utterance (10 s / 30 s of audio), decode latency
    for T in (1000, 3000):
        dt, tput = bench(nnet, params, S=1, T=T)
        print(f"single utterance T={T} ({T / 100:.0f}s audio): "
              f"{dt * 1e3:.2f} ms -> RTF {dt / (T / 100.0):.4f} "
              f"({tput:.0f} audio-s/s)")

    # batched scoring (offline/serving throughput)
    for S, T in ((32, 1000), (128, 500), (512, 100)):
        dt, tput = bench(nnet, params, S=S, T=T)
        print(f"batched S={S} T={T}: {dt * 1e3:.2f} ms/batch -> "
              f"{tput:.0f} audio-s/s")


if __name__ == "__main__":
    main()
