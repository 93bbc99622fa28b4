"""A/B the backward kernel v3 vs v4 in ONE process (between-process TPU
timings vary ±20-30%; in-process rankings are reliable — BENCH_NOTES.md).

v3 (frozen snapshot below): c(t-1)/r(t-1) streamed as separate
concat-materialized arrays; dx always computed.
v4 (module): in-block shift + per-block boundary rows; optional dx skip.

Run on TPU:  python tools_dev/bench_bwd_v4.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

import kaldi_lstm_tpu.ops.lstm_pallas as lp  # noqa: E402
from kaldi_lstm_tpu.ops import init_lstm_params, zero_state  # noqa: E402

S, T, I, C, R = 512, 20, 40, 800, 512


# --------------------------------------------------------------------------
# frozen v3 backward (pre-v4 snapshot of _bwd_kernel/_bwd_call)
# --------------------------------------------------------------------------

def _bwd_kernel_v3(gifo_ref, c_ref, cprev_ref, gr_ref, x_ref, rprev_ref,
                   wgr_ref, wrm_ref, wxp_ref, peep_ref, gcT_ref, *rest,
                   cp, tb):
    (dx_ref, dwx_ref, dwr_ref, dwrm_ref, dbias_ref, dpeep_ref,
     dc0_ref, dr0_ref, dc_s, dr_s) = rest
    s = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dc_s[:] = gcT_ref[:]
        dr_s[:] = jnp.zeros_like(dr_s)

    @pl.when((t == 0) & (s == 0))
    def _():
        dwx_ref[:] = jnp.zeros_like(dwx_ref)
        dwr_ref[:] = jnp.zeros_like(dwr_ref)
        dwrm_ref[:] = jnp.zeros_like(dwrm_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dpeep_ref[:] = jnp.zeros_like(dpeep_ref)

    wdt = wgr_ref.dtype
    dc = dc_s[:]
    dr = dr_s[:]
    acc_dwx = jnp.zeros(dwx_ref.shape, jnp.float32)
    acc_dwr = jnp.zeros(dwr_ref.shape, jnp.float32)
    acc_dwrm = jnp.zeros(dwrm_ref.shape, jnp.float32)
    acc_dbias = jnp.zeros((1, 4 * cp), jnp.float32)
    acc_dpi = jnp.zeros((1, cp), jnp.float32)
    acc_dpf = jnp.zeros((1, cp), jnp.float32)
    acc_dpo = jnp.zeros((1, cp), jnp.float32)
    for k in reversed(range(tb)):
        g = gifo_ref[k, :, 0 * cp:1 * cp].astype(jnp.float32)
        i = gifo_ref[k, :, 1 * cp:2 * cp].astype(jnp.float32)
        f = gifo_ref[k, :, 2 * cp:3 * cp].astype(jnp.float32)
        o = gifo_ref[k, :, 3 * cp:4 * cp].astype(jnp.float32)
        c = c_ref[k]
        c_prev = cprev_ref[k]
        h = jnp.tanh(c)
        dr_total = gr_ref[k] + dr
        dm = jnp.dot(dr_total.astype(wdt), wrm_ref[:],
                     preferred_element_type=jnp.float32)
        dh = dm * o
        dc_from_h = dh * (1.0 - h * h)
        do = dm * h * o * (1.0 - o)
        dc_total = dc + dc_from_h + do * peep_ref[2:3, :]
        df = dc_total * c_prev * f * (1.0 - f)
        di = dc_total * g * i * (1.0 - i)
        dg = dc_total * i * (1.0 - g * g)
        dgifo = jnp.concatenate([dg, di, df, do], axis=-1)
        dc = dc_total * f + di * peep_ref[0:1, :] + df * peep_ref[1:2, :]
        dr = jnp.dot(dgifo.astype(wdt), wgr_ref[:],
                     preferred_element_type=jnp.float32)
        dx_ref[k] = jnp.dot(dgifo.astype(wdt), wxp_ref[:],
                            preferred_element_type=jnp.float32)
        acc_dwx += lp._contract0(dgifo.astype(wdt), x_ref[k].astype(wdt))
        acc_dwr += lp._contract0(dgifo.astype(wdt),
                                 rprev_ref[k].astype(wdt))
        acc_dwrm += lp._contract0(dr_total.astype(wdt), (h * o).astype(wdt))
        acc_dbias += jnp.sum(dgifo, axis=0, keepdims=True)
        acc_dpi += jnp.sum(di * c_prev, axis=0, keepdims=True)
        acc_dpf += jnp.sum(df * c_prev, axis=0, keepdims=True)
        acc_dpo += jnp.sum(do * c, axis=0, keepdims=True)
    dc_s[:] = dc
    dr_s[:] = dr
    dwx_ref[:] += acc_dwx
    dwr_ref[:] += acc_dwr
    dwrm_ref[:] += acc_dwrm
    dbias_ref[0:1, :] += acc_dbias
    dpeep_ref[0:1, :] += acc_dpi
    dpeep_ref[1:2, :] += acc_dpf
    dpeep_ref[2:3, :] += acc_dpo
    dc0_ref[:] = dc
    dr0_ref[:] = dr


def _bwd_call_v3(gifo, c_seq, c_prev_seq, g_r, x_pad, r_prev, wgr, wrm,
                 wxp, peep, gcT, *, st, tb):
    T_, sp, c4p = gifo.shape
    cp = c4p // 4
    rp = g_r.shape[2]
    ip = x_pad.shape[2]

    def idx_rev(s, t):
        return (T_ // tb - 1 - t, s, 0)

    def idx_const(s, t):
        return (0, 0)

    def idx_s(s, t):
        return (s, 0)

    return pl.pallas_call(
        functools.partial(_bwd_kernel_v3, cp=cp, tb=tb),
        grid=(sp // st, T_ // tb),
        in_specs=[
            pl.BlockSpec((tb, st, 4 * cp), idx_rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, st, cp), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, st, cp), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, st, rp), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, st, ip), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, st, rp), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * cp, rp), idx_const, memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, cp), idx_const, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * cp, ip), idx_const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cp), idx_const, memory_space=pltpu.VMEM),
            pl.BlockSpec((st, cp), idx_s, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, st, ip), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * cp, ip), idx_const, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * cp, rp), idx_const, memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, cp), idx_const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4 * cp), idx_const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cp), idx_const, memory_space=pltpu.VMEM),
            pl.BlockSpec((st, cp), idx_s, memory_space=pltpu.VMEM),
            pl.BlockSpec((st, rp), idx_s, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_, sp, ip), jnp.float32),
            jax.ShapeDtypeStruct((4 * cp, ip), jnp.float32),
            jax.ShapeDtypeStruct((4 * cp, rp), jnp.float32),
            jax.ShapeDtypeStruct((rp, cp), jnp.float32),
            jax.ShapeDtypeStruct((8, 4 * cp), jnp.float32),
            jax.ShapeDtypeStruct((8, cp), jnp.float32),
            jax.ShapeDtypeStruct((sp, cp), jnp.float32),
            jax.ShapeDtypeStruct((sp, rp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((st, cp), jnp.float32),
            pltpu.VMEM((st, rp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=lp._VMEM_LIMIT),
        interpret=False,
    )(gifo, c_seq, c_prev_seq, g_r, x_pad, r_prev, wgr, wrm, wxp, peep,
      gcT)


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
    params = init_lstm_params(jax.random.PRNGKey(0), I, C, R, 0.02)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, S, I))  # time-major
    st0 = zero_state(S, C, R)
    d = lp._plan_dims(S, T, I, C, R)
    print(f"dims: {d}", file=sys.stderr)

    # residuals from the real forward
    (x_p, wxb, bias, wr, wcr, peep, c0, r0, _m) = jax.jit(
        lambda: lp._prepare(params, x, st0, d, True))()
    gifo, c_seq, r_seq = jax.jit(lambda: lp._fwd_call(
        x_p, wxb, bias, wr, wcr, peep, c0, r0, st=d.st, tb=d.tb,
        cell_clip=50.0, interpret=False))()
    g_r = jax.random.normal(jax.random.PRNGKey(2),
                            (T, d.sp, d.rp)) * 0.01
    gcT = jax.random.normal(jax.random.PRNGKey(3), (d.sp, d.cp)) * 0.01
    ip = lp._round_up(I, 128)
    x_pad = jnp.pad(x, ((0, 0), (0, d.sp - S), (0, ip - I)))
    wgr = lp._pad2(lp._pad_gate_mat(params.w_gifo_r, d.cp), 4 * d.cp, d.rp)
    wrm = lp._pad2(params.w_r_m, d.rp, d.cp)
    wxp = jnp.pad(lp._pad_gate_mat(params.w_gifo_x, d.cp),
                  ((0, 0), (0, ip - I)))
    peep3 = jnp.stack([params.peephole_i_c, params.peephole_f_c,
                       params.peephole_o_c])
    peep3 = jnp.pad(peep3, ((0, 0), (0, d.cp - C)))
    st_b, tb_b = min(d.st, 128), d.tb

    @jax.jit
    def v3(g):
        cp_seq = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)
        rp_seq = jnp.concatenate([r0[None], r_seq[:-1]], axis=0)
        outs = _bwd_call_v3(gifo, c_seq, cp_seq, g, x_pad, rp_seq, wgr,
                            wrm, wxp, peep3, gcT, st=st_b, tb=tb_b)
        return g + (jnp.sum(outs[0]) + jnp.sum(outs[1])) * 1e-30

    def make_v4(need_dx):
        @jax.jit
        def v4(g):
            c_bnd = jnp.concatenate([c0[None],
                                     c_seq[tb_b - 1::tb_b][:-1]], 0)
            r_bnd = jnp.concatenate([r0[None],
                                     r_seq[tb_b - 1::tb_b][:-1]], 0)
            outs = lp._bwd_call(gifo, c_seq, c_bnd, g, x_pad, r_seq,
                                r_bnd, wgr, wrm, wxp, peep3, gcT,
                                st=st_b, tb=tb_b, need_dx=need_dx,
                                interpret=False)
            extra = jnp.sum(outs[0]) if need_dx else 0.0
            return g + (extra + jnp.sum(outs[1])) * 1e-30
        return v4

    # numeric check v3 vs v4 on-chip
    o3 = jax.jit(lambda: _bwd_call_v3(
        gifo, c_seq, jnp.concatenate([c0[None], c_seq[:-1]], 0), g_r,
        x_pad, jnp.concatenate([r0[None], r_seq[:-1]], 0), wgr, wrm, wxp,
        peep3, gcT, st=st_b, tb=tb_b))()
    o4 = jax.jit(lambda: lp._bwd_call(
        gifo, c_seq, jnp.concatenate([c0[None],
                                      c_seq[tb_b - 1::tb_b][:-1]], 0),
        g_r, x_pad, r_seq,
        jnp.concatenate([r0[None], r_seq[tb_b - 1::tb_b][:-1]], 0),
        wgr, wrm, wxp, peep3, gcT, st=st_b, tb=tb_b, need_dx=True,
        interpret=False))()
    import numpy as np
    for a, b, name in zip(o3[1:4], o4[1:4], ["dWx", "dWr", "dWrm"]):
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"check {name}: max |v3-v4| = {err:.3e}")
        assert err < 1e-3, name

    t3 = timeit(v3, g_r)
    t4 = timeit(make_v4(True), g_r)
    t4nd = timeit(make_v4(False), g_r)
    print(f"bwd v3 (concat streams, dx): {t3 * 1e3:7.3f} ms")
    print(f"bwd v4 (boundary rows, dx):  {t4 * 1e3:7.3f} ms")
    print(f"bwd v4 (no dx):              {t4nd * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
