"""Decompose the Pallas LSTM time: full op vs kernel-only (inputs
pre-prepared, no layout transposes), f32 vs bf16 dots — locates the
remaining cost between MXU rate, VPU gate math, and the [S,T]<->[T,S]
layout conversions in _prepare/_lstm_pallas_bwd."""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import kaldi_lstm_tpu.ops.lstm_pallas as lp
from kaldi_lstm_tpu.models.components import set_matmul_dtype
from kaldi_lstm_tpu.ops import init_lstm_params, zero_state

S, T, I, C, R = 512, 20, 40, 800, 512


def timeit(step, carry, iters=30, warmup=5):
    for _ in range(warmup):
        carry = step(carry)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(carry)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    key = jax.random.PRNGKey(0)
    params = init_lstm_params(key, I, C, R, 0.02)
    x = jax.random.normal(jax.random.PRNGKey(1), (S, T, I))
    st0 = zero_state(S, C, R)
    d = lp._plan_dims(S, T, I, C, R)
    print(f"dims: {d}", file=sys.stderr)

    for bf16 in (False, True):
        set_matmul_dtype(jnp.bfloat16 if bf16 else None)
        tag = "bf16" if bf16 else "f32 "

        # 1) full op, inference path
        @jax.jit
        def full_fwd(state):
            _, fin = lp.lstm_scan_pallas(params, x, state)
            return fin

        # 2) kernel-only inference: operands prepared once outside
        (x_p, wxb, bias, wr, wcr, peep, c0, r0, _m) = jax.jit(
            lambda: lp._prepare(params, x, zero_state(S, C, R), d))()

        @jax.jit
        def ker_fwd(c0r0):
            c0_, r0_ = c0r0
            rs, cl = lp._infer_call(x_p, wxb, bias, wr, wcr, peep, c0_,
                                    r0_, st=d.st, tb=d.tb,
                                    cell_clip=50.0, interpret=False)
            return (cl, rs[T - 1])

        # 3) prepare alone (pad + transpose; projection is in-kernel now)
        @jax.jit
        def prep(xin):
            xp_, *_ = lp._prepare(params, xin, zero_state(S, C, R), d)
            return xin + jnp.sum(xp_) * 1e-30  # chain: feed next iter

        # 4) full fwd+bwd via custom vjp
        def loss(p):
            out, fin = lp.lstm_scan_pallas(p, x, st0)
            return jnp.sum(out) + jnp.sum(fin.c)

        @jax.jit
        def train(p):
            g = jax.grad(loss)(p)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, p, g)

        # 5) training-fwd kernel only (with residual writes)
        @jax.jit
        def ker_train_fwd(c0r0):
            c0_, r0_ = c0r0
            gifo, cs, rs = lp._fwd_call(x_p, wxb, bias, wr, wcr, peep,
                                        c0_, r0_, st=d.st, tb=d.tb,
                                        cell_clip=50.0, interpret=False)
            return (cs[T - 1], rs[T - 1])

        t1 = timeit(full_fwd, st0)
        t2 = timeit(ker_fwd, (c0, r0))
        t3 = timeit(prep, x)
        t4 = timeit(train, params)
        t5 = timeit(ker_train_fwd, (c0, r0))
        print(f"[{tag}] full-infer {t1*1e3:7.3f} | kernel-infer "
              f"{t2*1e3:7.3f} | prepare {t3*1e3:7.3f} | train f+b "
              f"{t4*1e3:7.3f} | kernel-train-fwd {t5*1e3:7.3f} ms",
              flush=True)
    set_matmul_dtype(None)


if __name__ == "__main__":
    main()
