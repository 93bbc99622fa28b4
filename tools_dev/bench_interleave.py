"""Experiment: can the LSTM fwd kernel overlap VPU gate math with MXU
dots by processing two half-stream-tiles interleaved? (Ablation showed
~45% of fwd kernel time is elementwise gate math that serializes with
the dots — bench_cell_ablation.py.)

v0: current structure, one [st, .] block per grid step.
v1: same block split into halves A/B; B's recurrent dot is issued
    between A's dot and A's gate math so the scheduler can run A's VPU
    work under B's MXU time.

Kernel-only timings, operands pre-prepared, K-scan chained per dispatch.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import kaldi_lstm_tpu.ops.lstm_pallas as lp
from kaldi_lstm_tpu.ops import init_lstm_params, zero_state

S, T, I, C, R = 512, 20, 40, 800, 512
K = 8


def _gates(gifo, xc, c_prev, peep_ref, cp, cell_clip, wcr_ref):
    g = jnp.tanh(gifo[:, 0 * cp:1 * cp])
    i = jax.nn.sigmoid(gifo[:, 1 * cp:2 * cp] + c_prev * peep_ref[0:1, :])
    f = jax.nn.sigmoid(gifo[:, 2 * cp:3 * cp] + c_prev * peep_ref[1:2, :])
    c = g * i + c_prev * f
    c = jnp.clip(c, -cell_clip, cell_clip)
    h = jnp.tanh(c)
    o = jax.nn.sigmoid(gifo[:, 3 * cp:4 * cp] + c * peep_ref[2:3, :])
    wdt = wcr_ref.dtype
    r = jnp.dot((h * o).astype(wdt), wcr_ref[:],
                preferred_element_type=jnp.float32)
    return g, i, f, o, c, r


def _kernel_v1(x_ref, wxb_ref, bias_ref, wr_ref, wcr_ref, peep_ref,
               c0_ref, r0_ref, gifo_ref, c_ref, r_ref, c_s, r_s, *,
               cp: int, tb: int, cell_clip: float, half: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        c_s[:] = c0_ref[:]
        r_s[:] = r0_ref[:]

    wdt = wr_ref.dtype
    h = half
    cA, rA = c_s[:h], r_s[:h]
    cB, rB = c_s[h:], r_s[h:]
    for k in range(tb):
        # both halves' input+recurrent dots issue first (MXU), then A's
        # gate math (VPU) can run under B's dot
        xwA = jnp.dot(x_ref[k, :h].astype(wdt), wxb_ref[:],
                      preferred_element_type=jnp.float32) + bias_ref[0:1]
        gifoA = xwA + jnp.dot(rA.astype(wdt), wr_ref[:],
                              preferred_element_type=jnp.float32)
        xwB = jnp.dot(x_ref[k, h:].astype(wdt), wxb_ref[:],
                      preferred_element_type=jnp.float32) + bias_ref[0:1]
        gifoB = xwB + jnp.dot(rB.astype(wdt), wr_ref[:],
                              preferred_element_type=jnp.float32)
        gA, iA, fA, oA, cA, rA = _gates(gifoA, xwA, cA, peep_ref, cp,
                                        cell_clip, wcr_ref)
        gB, iB, fB, oB, cB, rB = _gates(gifoB, xwB, cB, peep_ref, cp,
                                        cell_clip, wcr_ref)
        gifo_ref[k, :h] = jnp.concatenate([gA, iA, fA, oA], -1).astype(
            gifo_ref.dtype)
        gifo_ref[k, h:] = jnp.concatenate([gB, iB, fB, oB], -1).astype(
            gifo_ref.dtype)
        c_ref[k, :h] = cA
        c_ref[k, h:] = cB
        r_ref[k, :h] = rA
        r_ref[k, h:] = rB
    c_s[:h], c_s[h:] = cA, cB
    r_s[:h], r_s[h:] = rA, rB


def call_v1(x_p, wxb, bias, wr, wcr, peep, c0, r0, *, st, tb,
            cell_clip):
    T_, sp, ip = x_p.shape
    c4p = wxb.shape[1]
    cp = c4p // 4
    rp = wr.shape[0]
    grid = (sp // st, T_ // tb)
    return pl.pallas_call(
        functools.partial(_kernel_v1, cp=cp, tb=tb, cell_clip=cell_clip,
                          half=st // 2),
        grid=grid,
        in_specs=lp._fwd_in_specs(st, tb, cp, rp, ip, False),
        out_specs=[
            pl.BlockSpec((tb, st, 4 * cp), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, st, cp), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, st, rp), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_, sp, 4 * cp), wr.dtype),
            jax.ShapeDtypeStruct((T_, sp, cp), jnp.float32),
            jax.ShapeDtypeStruct((T_, sp, rp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((st, cp), jnp.float32),
                        pltpu.VMEM((st, rp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=lp._VMEM_LIMIT),
        interpret=False,
    )(x_p, wxb, bias, wr, wcr, peep, c0, r0)


def timeit(step, carry, iters=20, warmup=4):
    for _ in range(warmup):
        carry = step(carry)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(carry)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    return (time.perf_counter() - t0) / iters / K


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    params = init_lstm_params(jax.random.PRNGKey(0), I, C, R, 0.02)
    x = jax.random.normal(jax.random.PRNGKey(1), (S, T, I))

    for st in (128, 256):
        d = lp._plan_dims(S, T, I, C, R, max_stream_tile=st,
                          max_time_block=5)
        ops = jax.jit(lambda: lp._prepare(params, x,
                                          zero_state(S, C, R), d))()
        (x_p, wxb, bias, wr, wcr, peep, c0, r0, _m) = ops

        @jax.jit
        def v0(c0r0, d=d, x_p=x_p, wxb=wxb, bias=bias, wr=wr, wcr=wcr,
               peep=peep):
            def body(cr, _):
                gifo, cs, rs = lp._fwd_call(
                    x_p, wxb, bias, wr, wcr, peep, cr[0], cr[1],
                    st=d.st, tb=d.tb, cell_clip=50.0, interpret=False)
                return (cs[T - 1], rs[T - 1]), 0
            cr, _ = jax.lax.scan(body, c0r0, None, length=K)
            return cr

        @jax.jit
        def v1(c0r0, d=d, x_p=x_p, wxb=wxb, bias=bias, wr=wr, wcr=wcr,
               peep=peep):
            def body(cr, _):
                gifo, cs, rs = call_v1(
                    x_p, wxb, bias, wr, wcr, peep, cr[0], cr[1],
                    st=d.st, tb=d.tb, cell_clip=50.0)
                return (cs[T - 1], rs[T - 1]), 0
            cr, _ = jax.lax.scan(body, c0r0, None, length=K)
            return cr

        t0_ = timeit(v0, (c0, r0))
        t1_ = timeit(v1, (c0, r0))
        # numeric check
        a = jax.jit(lambda: lp._fwd_call(x_p, wxb, bias, wr, wcr, peep,
                                         c0, r0, st=d.st, tb=d.tb,
                                         cell_clip=50.0,
                                         interpret=False))()
        b = jax.jit(lambda: call_v1(x_p, wxb, bias, wr, wcr, peep, c0,
                                    r0, st=d.st, tb=d.tb,
                                    cell_clip=50.0))()
        err = max(float(jnp.max(jnp.abs(u - v))) for u, v in zip(a, b))
        print(f"st={st:4d} tb={d.tb}: v0 {t0_*1e3:7.3f} ms | "
              f"v1-interleaved {t1_*1e3:7.3f} ms | maxabs {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
