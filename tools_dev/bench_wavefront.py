"""A/B: serial two-kernel 2xLSTMP schedule vs the wavefront-fused kernel
(ops/lstm_stack_pallas.py) at the deep-config shape.

Decision gate for VERDICT r3 item 1: only if the wavefront forward wins
does the custom-VJP backward get built. Methodology per BENCH_NOTES:
iterations chain (outputs perturb the next input), one host
materialization at the end, G kernel calls per dispatch via lax.scan.

Usage: python tools_dev/bench_wavefront.py [S] [G] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models.components import set_matmul_dtype
from kaldi_lstm_tpu.ops import lstm_stack_pallas as w2
from kaldi_lstm_tpu.ops.lstm_cell import init_lstm_params, zero_state
from kaldi_lstm_tpu.ops import lstm_pallas as w1
from kaldi_lstm_tpu.ops.lstm_pallas import _plan_dims

S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
T, I, C, R = 20, 40, 800, 512
CLIP = 50.0
INTERPRET = jax.default_backend() == "cpu"

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
p1 = init_lstm_params(k1, I, C, R, 0.05)
p2 = init_lstm_params(k2, R, C, R, 0.05)
x0 = jax.random.normal(jax.random.PRNGKey(3), (T, S, I))
s1 = zero_state(S, C, R)
s2 = zero_state(S, C, R)


def serial_fwd(x, tb_max):
    """Production schedule: layer-1 train-fwd kernel, r1 stream through
    HBM, layer-2 train-fwd kernel (input projection fused in each)."""
    d1 = _plan_dims(S, T, I, C, R, max_time_block=tb_max)
    ops = w1._prepare(p1, x, s1, d1, True)
    gifo1, c1, r1 = w1._fwd_call(*ops[:-1], st=d1.st, tb=d1.tb,
                                 cell_clip=CLIP, interpret=INTERPRET)
    r1u = r1[:, :S, :R]
    d2 = _plan_dims(S, T, R, C, R, max_time_block=tb_max)
    ops2 = w1._prepare(p2, r1u, s2, d2, True)
    gifo2, c2, r2 = w1._fwd_call(*ops2[:-1], st=d2.st, tb=d2.tb,
                                 cell_clip=CLIP, interpret=INTERPRET)
    return r2[:, :S, :R], (gifo1, c1, gifo2, c2)


def wave_fwd(x, tb):
    d = _plan_dims(S, T, I, C, R)._replace(tb=tb)
    xp, ops1, ops2, c01, r01, c02, r02 = w2._prep2(
        p1, p2, x, s1, s2, d, True)
    gifo1, c1, r1, gifo2, c2, r2 = w2._fwd2_call(
        xp, ops1, ops2, c01, r01, c02, r02, st=d.st, tb=tb,
        cell_clip=CLIP, gifo_dtype=ops1[2].dtype, interpret=INTERPRET)
    return r2[tb:tb + T, :S, :R], (gifo1, c1, gifo2, c2)


def wave_fwd_phase(x, tb, phases):
    """Ablation: run the wavefront kernel with one phase statically
    disabled. t(both) ~= t(l1) + t(l2) proves the phases execute
    strictly serially (no cross-phase MXU/VPU overlap); t(both) well
    below the sum would show partial overlap. Chain on the live
    phase's output."""
    d = _plan_dims(S, T, I, C, R)._replace(tb=tb)
    xp, ops1, ops2, c01, r01, c02, r02 = w2._prep2(
        p1, p2, x, s1, s2, d, True)
    gifo1, c1, r1, gifo2, c2, r2 = w2._fwd2_call(
        xp, ops1, ops2, c01, r01, c02, r02, st=d.st, tb=tb,
        cell_clip=CLIP, gifo_dtype=ops1[2].dtype, interpret=INTERPRET,
        phases=phases)
    out = r1[:T] if phases == "l1" else r2[tb:tb + T]
    return out[:, :S, :R], ()


def serial_one_layer(x, tb_max):
    """Single layer-1 train-fwd kernel alone (the reference point for
    the ablation sums)."""
    d1 = _plan_dims(S, T, I, C, R, max_time_block=tb_max)
    ops = w1._prepare(p1, x, s1, d1, True)
    gifo1, c1, r1 = w1._fwd_call(*ops[:-1], st=d1.st, tb=d1.tb,
                                 cell_clip=CLIP, interpret=INTERPRET)
    return r1[:, :S, :R], ()


def serial_infer(x, tb_max):
    d1 = _plan_dims(S, T, I, C, R, max_time_block=tb_max)
    ops = w1._prepare(p1, x, s1, d1, True)
    r1, c1T = w1._infer_call(*ops[:-1], st=d1.st, tb=d1.tb,
                             cell_clip=CLIP, interpret=INTERPRET)
    r1u = r1[:, :S, :R]
    d2 = _plan_dims(S, T, R, C, R, max_time_block=tb_max)
    ops2 = w1._prepare(p2, r1u, s2, d2, True)
    r2, c2T = w1._infer_call(*ops2[:-1], st=d2.st, tb=d2.tb,
                             cell_clip=CLIP, interpret=INTERPRET)
    return r2[:, :S, :R], (c2T,)


def wave_infer(x, tb):
    d = _plan_dims(S, T, I, C, R)._replace(tb=tb)
    xp, ops1, ops2, c01, r01, c02, r02 = w2._prep2(
        p1, p2, x, s1, s2, d, True)
    r2, c1T, r1T, c2T = w2._infer2_call(
        xp, ops1, ops2, c01, r01, c02, r02, st=d.st, tb=tb,
        cell_clip=CLIP, interpret=INTERPRET)
    return r2[tb:tb + T, :S, :R], (c2T,)


def bench(name, fn, *args):
    """G chained calls per dispatch; median of REPS timed dispatches."""
    @jax.jit
    def grouped(x):
        def body(xc, _):
            out, _res = fn(xc, *args)
            # chain: next input depends on this output, value unchanged
            xc = xc + 0.0 * jnp.sum(out)
            return xc, jnp.sum(out)
        xc, sums = jax.lax.scan(body, x, None, length=G)
        return xc, jnp.sum(sums)

    try:
        xc, chk = grouped(x0)
        float(chk)  # compile + settle
        vals = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            xc, chk = grouped(xc)
            c = float(chk)
            vals.append((time.perf_counter() - t0) / G * 1e3)
        med = sorted(vals)[len(vals) // 2]
        print(f"{name}: {med:.3f} ms/call (runs "
              f"{[round(v, 3) for v in vals]}, chk {c:.4f})", flush=True)
        return med
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return float("nan")


def main():
    MODE = sys.argv[4] if len(sys.argv) > 4 else "ab"
    print(f"backend={jax.default_backend()} S={S} G={G} reps={REPS} "
          f"mode={MODE}", flush=True)

    if MODE == "ablate":
        # phase-serialization ablation (f32, tb5): does t(both) equal
        # t(l1) + t(l2)?
        tl1 = bench("wave fwd PHASE l1-only tb5", wave_fwd_phase, 5, "l1")
        tl2 = bench("wave fwd PHASE l2-only tb5", wave_fwd_phase, 5, "l2")
        tb_ = bench("wave fwd both tb5", wave_fwd, 5)
        t1 = bench("serial ONE layer tb5", serial_one_layer, 5)
        print(f"sum(l1, l2) = {tl1 + tl2:.3f} ms vs both {tb_:.3f} ms "
              f"(overlap fraction "
              f"{(tl1 + tl2 - tb_) / min(tl1, tl2):.2f}); "
              f"single-layer kernel {t1:.3f} ms", flush=True)
        return

    for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        set_matmul_dtype(dt)
        try:
            base = bench(f"serial fwd {dt_name} tb5", serial_fwd, 5)
            for tb in (5, 4, 2):
                m = bench(f"wave   fwd {dt_name} tb{tb}", wave_fwd, tb)
                if m == m and base == base:
                    print(f"  -> wavefront speedup {base / m:.3f}x",
                          flush=True)
            base = bench(f"serial infer {dt_name} tb5", serial_infer, 5)
            for tb in (5, 4):
                m = bench(f"wave   infer {dt_name} tb{tb}", wave_infer,
                          tb)
                if m == m and base == base:
                    print(f"  -> wavefront speedup {base / m:.3f}x",
                          flush=True)
        finally:
            set_matmul_dtype(None)


if __name__ == "__main__":
    main()
