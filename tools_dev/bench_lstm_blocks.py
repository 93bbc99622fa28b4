"""Sweep the LSTM kernel's (time_block, stream_tile) on the flagship
shape in ONE process (per-process TPU claim + compile makes bash-loop
sweeps impractical); both are module constants, so each config reloads
the module. Measures fwd-only (inference kernel) and fwd+bwd (training
kernels) with chained iterations + host materialization (axon rules).
"""

import importlib
import os
import sys
import time

import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.ops import init_lstm_params, zero_state

S, T, I, C, R = 512, 20, 40, 800, 512


def run(tb, st, vmem_mb=110, dtype=None):
    os.environ["KLT_LSTM_TIME_BLOCK"] = str(tb)
    os.environ["KLT_LSTM_STREAM_TILE"] = str(st)
    os.environ["KLT_LSTM_VMEM_LIMIT"] = str(vmem_mb * 1024 * 1024)
    from kaldi_lstm_tpu.models.components import set_matmul_dtype
    set_matmul_dtype(jnp.bfloat16 if dtype == "bf16" else None)
    import kaldi_lstm_tpu.ops.lstm_pallas as lp
    importlib.reload(lp)

    key = jax.random.PRNGKey(0)
    params = init_lstm_params(key, I, C, R, 0.02)
    x = jax.random.normal(jax.random.PRNGKey(1), (S, T, I))
    st0 = zero_state(S, C, R)

    K = 8  # kernel invocations per dispatch: the axon tunnel costs
    # ~1 ms per dispatch, which would otherwise swamp kernel deltas

    @jax.jit
    def fwd(state):
        def body(s, _):
            _, fin = lp.lstm_scan_pallas(params, x, s)
            return fin, 0
        s, _ = jax.lax.scan(body, state, None, length=K)
        return s

    def loss(p):
        out, fin = lp.lstm_scan_pallas(p, x, st0)
        return jnp.sum(out) + jnp.sum(fin.c)

    @jax.jit
    def train(p):
        def body(q, _):
            g = jax.grad(loss)(q)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-7 * b, q, g), 0
        q, _ = jax.lax.scan(body, p, None, length=K)
        return q

    def timeit(step, carry, iters=30, warmup=5):
        for _ in range(warmup):
            carry = step(carry)
        float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(carry)
        float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
        return (time.perf_counter() - t0) / iters

    try:
        tf = timeit(fwd, st0) / K
        tg = timeit(train, params) / K
        print(f"tb={tb:3d} st={st:4d} {dtype or 'f32 '}: "
              f"fwd {tf*1e3:7.3f} ms | "
              f"fwd+bwd {tg*1e3:7.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001 — report which config failed
        print(f"tb={tb:3d} st={st:4d}: FAILED "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    cfgs = os.environ.get(
        "KLT_SWEEP", "1:128,2:128,5:128,10:128,20:128,5:64,5:256,10:256")
    for c in cfgs.split(","):
        parts = c.split(":")
        tb, st = int(parts[0]), int(parts[1])
        dtype = parts[2] if len(parts) > 2 else None
        run(tb, st, dtype=dtype)


if __name__ == "__main__":
    main()
