"""Dev benchmark: fused Pallas LSTM scan vs lax.scan on the TPU chip,
flagship dims (C=800, R=512, I=40), fwd and fwd+bwd.

Measurement notes: the axon platform is experimental — block_until_ready
can return before execution, and unconsumed results may be skipped. Every
timed loop therefore CHAINS iterations (output feeds the next input) and
ends with a host materialization of a value depending on the whole chain.
"""

import sys
import time

import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.ops import LstmState, init_lstm_params, lstm_scan, \
    zero_state
from kaldi_lstm_tpu.ops.lstm_pallas import lstm_scan_pallas

I, C, R = 40, 800, 512


def timeit_chained(step, carry, iters=30, warmup=5):
    """step: carry -> carry (jitted). Chains iterations; returns s/iter."""
    for _ in range(warmup):
        carry = step(carry)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))  # host sync
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(carry)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    key = jax.random.PRNGKey(0)
    params = init_lstm_params(key, I, C, R, 0.02)

    import os
    cfgs = os.environ.get("KLT_BENCH_CFGS", "4,128")
    for S, T in [(int(s), 20) for s in cfgs.split(",")]:
        x = jax.random.normal(jax.random.PRNGKey(1), (S, T, I))
        st0 = zero_state(S, C, R)

        # forward: carry = state
        @jax.jit
        def fwd_scan(st):
            out, fin = lstm_scan(params, x, st)
            return fin

        @jax.jit
        def fwd_pal(st):
            out, fin = lstm_scan_pallas(params, x, st)
            return fin

        # fwd+bwd: carry = params (grad step keeps the chain honest)
        def loss_scan(p, st):
            out, fin = lstm_scan(p, x, st)
            return jnp.sum(out) + jnp.sum(fin.c)

        def loss_pal(p, st):
            out, fin = lstm_scan_pallas(p, x, st)
            return jnp.sum(out) + jnp.sum(fin.c)

        @jax.jit
        def train_scan(p):
            g = jax.grad(loss_scan)(p, st0)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, p, g)

        @jax.jit
        def train_pal(p):
            g = jax.grad(loss_pal)(p, st0)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, p, g)

        tf_scan = timeit_chained(fwd_scan, st0)
        print(f"S={S} fwd scan {tf_scan*1e3:.3f}ms", flush=True)
        tf_pal = timeit_chained(fwd_pal, st0)
        print(f"S={S} fwd pallas {tf_pal*1e3:.3f}ms "
              f"({tf_scan/tf_pal:.2f}x)", flush=True)
        tg_scan = timeit_chained(train_scan, params)
        print(f"S={S} fwd+bwd scan {tg_scan*1e3:.3f}ms", flush=True)
        tg_pal = timeit_chained(train_pal, params)
        frames = S * T
        print(f"S={S:4d} T={T}: fwd {tf_scan/tf_pal:5.2f}x | "
              f"fwd+bwd scan {tg_scan*1e3:7.3f}ms pallas "
              f"{tg_pal*1e3:7.3f}ms ({tg_scan/tg_pal:5.2f}x) | "
              f"pallas train {frames/tg_pal/100:9.0f} audio-s/s",
              flush=True)


if __name__ == "__main__":
    main()
