"""Deep-config (2x LSTMP -> 16624 senones) treatment sweep: grouped
device step, bf16 matmuls, stream-count sweep — the same optimizations
the flagship headline got (VERDICT round-1 weak #1). Same-process A/B so
tunnel variance cancels in the rankings.

Usage: python tools_dev/bench_deep.py [quick]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.models.components import set_matmul_dtype
from kaldi_lstm_tpu.train import TrainOptions, init_momentum
from kaldi_lstm_tpu.train.trainer import make_grouped_train_step, \
    make_train_step

from bench import PROTO_DEEP

T = 20


def bench(nnet, params0, S, group, bf16, warmup=1, iters=5):
    opts = TrainOptions(learn_rate=1e-5, momentum=0.9)
    if bf16:
        set_matmul_dtype(jnp.bfloat16)
    try:
        params = jax.tree_util.tree_map(jnp.array, params0)
        opt = init_momentum(params)
        states = nnet.init_states(S)
        nclass = nnet.output_dim
        rng = np.random.RandomState(0)
        if group > 1:
            step = make_grouped_train_step(nnet, opts)
            feats = jnp.asarray(rng.randn(group, S, T, 40), jnp.float32)
            ids = jnp.asarray(rng.randint(0, nclass, (group, S, T, 1)),
                              jnp.int32)
            w = jnp.ones((group, S, T, 1), jnp.float32)
            mask = jnp.ones((group, S, T), jnp.float32)
            flags = jnp.zeros((group, S), jnp.int32)
        else:
            step = make_train_step(nnet, opts)
            feats = jnp.asarray(rng.randn(S, T, 40), jnp.float32)
            ids = jnp.asarray(rng.randint(0, nclass, (S, T, 1)), jnp.int32)
            w = jnp.ones((S, T, 1), jnp.float32)
            mask = jnp.ones((S, T), jnp.float32)
            flags = jnp.zeros((S,), jnp.int32)
        lr = jnp.float32(1e-5)

        def host_sync():
            # chained-value host materialization (axon methodology,
            # BENCH_NOTES "Measurement methodology")
            return float(jnp.sum(params[1].bias))

        for _ in range(warmup):
            params, opt, states, aux = step(params, opt, states, (),
                                            feats, ids, w, mask, flags, lr)
        host_sync()
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt, states, aux = step(params, opt, states, (),
                                            feats, ids, w, mask, flags, lr)
        host_sync()
        dt = time.perf_counter() - t0
        sps = iters * group / dt
        return sps * S * T / 100.0, sps
    finally:
        if bf16:
            set_matmul_dtype(None)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    nnet, params = Nnet.init_from_proto(PROTO_DEEP, jax.random.PRNGKey(1))
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    configs = [
        ("S=256 per-dispatch f32 (r1 baseline)", 256, 1, False),
        ("S=512 grouped x16 f32", 512, 16, False),
        ("S=512 grouped x16 bf16", 512, 16, True),
        ("S=512 grouped x32 bf16", 512, 32, True),
        ("S=256 grouped x32 bf16", 256, 32, True),
    ]
    if quick:
        configs = configs[1:3]
    for name, S, g, bf16 in configs:
        tput, sps = bench(nnet, params, S, g, bf16)
        print(f"{name}: {tput:.1f} audio-s/s ({sps:.1f} steps/s, "
              f"{1000.0 / sps:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
