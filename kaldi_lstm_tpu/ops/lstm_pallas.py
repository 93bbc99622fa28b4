"""Fused Pallas TPU kernel for the projected-LSTM scan.

This is the TPU replacement for the reference's L0/L1 hot path: the per-t
loop of small GEMMs + elementwise kernels
(bd-nnet-lstm-projected-streams.h:261-325 forward, :369-454 backward;
custom CUDA ops in bd-cu-kernels.cu). Instead of T*~10 kernel launches
per chunk, ONE kernel runs the whole time loop with:

* recurrent weights (W_gifo_r^T, W_r_m^T) resident in VMEM across all
  timesteps;
* the (c, r) carry living in VMEM scratch between grid steps — never
  touching HBM;
* per-t HBM traffic limited to streaming xw(t) in and (gates, c, r) out,
  double-buffered by the Mosaic pipeline;
* all gate math fused on the VPU between the two MXU dots.

Grid is (S_tiles, T/tb) — time innermost (sequential dependence), stream
tiles outer so arbitrarily many streams fit in fixed VMEM. Each grid step
processes a block of tb timesteps (statically unrolled), amortizing the
per-grid-step pipeline overhead that dominates at [st, R]x[R, 4C]
granularity; tb is the largest divisor of T below KLT_LSTM_TIME_BLOCK.

The backward kernel replays the reverse recurrence
(d_r -> d_m -> d_h/d_o -> d_c -> d_f/d_i/d_g, exactly the reference's
"Version 1: precise gradients" structure) and emits per-t pre-activation
gate gradients; all weight gradients are then single large MXU GEMMs over
the [T*S] frame axis outside the kernel — the same hoisting the reference
uses (…streams.h:465-487).

Everything is padded to TPU tiles: C and R up to multiples of 128 (lane),
S up to sublane/grid tiles. Padded lanes provably stay zero through both
recurrences (zero-padded weights/inputs; see inline notes).

Layouts inside the kernel are time-major [T, S, .]; the public API matches
`lstm_cell.lstm_scan`: x [S, T, I], state (c [S, C], r [S, R]).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kaldi_lstm_tpu.ops.lstm_cell import LstmParams, LstmState


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _cell_forward(xw_t, c_prev, r_prev, wr_ref, wcr_ref, peep_ref, *,
                  cp: int, cell_clip: float, gate_dtype=None):
    """One timestep of the LSTMP cell on VMEM-resident operands.

    Math is bd-nnet-lstm-projected-streams.h:261-325: fused gifo
    pre-activation, i/f peepholes from c(t-1), cell clip, o peephole from
    clipped c(t), projection. Returns (g, i, f, o, c, r).

    `gate_dtype` (ablation knob, KLT_LSTM_GATE_DTYPE=bf16): run the
    elementwise gate chain — ~45% of fwd kernel time, VPU-bound
    (BENCH_NOTES "Recurrence bound established") — in bf16 to probe
    whether the VPU packs half-width ops at 2x. Timing probe first;
    numerics gates (convergence parity) required before any default."""
    wdt = wr_ref.dtype  # bf16 weights -> bf16 MXU dots, f32 accumulation
    gifo = xw_t + jnp.dot(r_prev.astype(wdt), wr_ref[:],
                          preferred_element_type=jnp.float32)
    if gate_dtype is not None:
        gifo = gifo.astype(gate_dtype)
        c_prev = c_prev.astype(gate_dtype)
        peep = peep_ref[:].astype(gate_dtype)
        # explicit logistic with dtype-matched constants: jax.nn.sigmoid
        # on bf16 trips a Mosaic verifier bug ('vector.broadcast' of an
        # f32 scalar into a bf16 vector)
        one = jnp.asarray(1.0, gate_dtype)

        def sigmoid(v):
            return one / (one + jnp.exp(-v))
    else:
        peep = peep_ref[:]
        sigmoid = jax.nn.sigmoid
    g = jnp.tanh(gifo[:, 0 * cp:1 * cp])
    i = sigmoid(gifo[:, 1 * cp:2 * cp] + c_prev * peep[0:1, :])
    f = sigmoid(gifo[:, 2 * cp:3 * cp] + c_prev * peep[1:2, :])
    c = g * i + c_prev * f
    if cell_clip > 0:
        c = jnp.clip(c, jnp.asarray(-cell_clip, c.dtype),
                     jnp.asarray(cell_clip, c.dtype))
    h = jnp.tanh(c)
    o = sigmoid(gifo[:, 3 * cp:4 * cp] + c * peep[2:3, :])
    r = jnp.dot((h * o).astype(wdt), wcr_ref[:],
                preferred_element_type=jnp.float32)
    if gate_dtype is not None:
        c = c.astype(jnp.float32)
    return g, i, f, o, c, r


def _hoisted_xw(x_ref, wxb_ref, tb: int, st: int, cp: int):
    """Block-hoisted input projection: the per-t xw GEMMs have no
    sequential dependence, so ONE [tb*st, ip] x [ip, 4cp] MXU op per
    grid step replaces tb small ones — bigger tiles, and the MXU work
    moves off the recurrence's serial chain (matters most for stacked
    layers where ip == rp, e.g. the deep config's layer 2 whose
    per-timestep projection made it 47% slower than layer 1 on-device,
    BENCH_NOTES round 4)."""
    wdt = wxb_ref.dtype
    xw = jnp.dot(x_ref[:].reshape(tb * st, x_ref.shape[2]).astype(wdt),
                 wxb_ref[:], preferred_element_type=jnp.float32)
    return xw.reshape(tb, st, 4 * cp)


def _fwd_kernel(x_ref, wxb_ref, bias_ref, wr_ref, wcr_ref, peep_ref,
                c0_ref, r0_ref, *rest, cp: int, tb: int,
                cell_clip: float, has_mask: bool, inv_keep: float,
                hoist_xw: bool = False, gate_dtype=None):
    """Training forward with the input projection FUSED: xw(t) is
    computed in VMEM from the (small) x block and the resident
    W_gifo_x^T — the [T, S, 4C] pre-activation stream (reference's
    hoisted GEMM output, …streams.h:246) never exists in HBM (~150 MB
    write + read per chunk at the flagship shape)."""
    if has_mask:
        mask_ref, gifo_ref, c_ref, r_ref, c_s, r_s = rest
    else:
        gifo_ref, c_ref, r_ref, c_s, r_s = rest
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        c_s[:] = c0_ref[:]
        r_s[:] = r0_ref[:]

    wdt = wr_ref.dtype
    c = c_s[:]
    r = r_s[:]
    st = c_s.shape[0]
    xw_all = _hoisted_xw(x_ref, wxb_ref, tb, st, cp) if hoist_xw \
        else None
    for k in range(tb):
        if hoist_xw:
            xw = xw_all[k]
        else:
            xw = jnp.dot(x_ref[k].astype(wdt), wxb_ref[:],
                         preferred_element_type=jnp.float32)
        if has_mask:
            # inverted gate dropout on the input projection, pre-bias
            # (lstm_cell.lstm_scan order; reference stubs this at
            # …streams.h:247-256)
            xw = xw * (mask_ref[k].astype(jnp.float32) * inv_keep)
        xw = xw + bias_ref[0:1, :]
        g, i, f, o, c, r = _cell_forward(xw, c, r, wr_ref, wcr_ref,
                                         peep_ref, cp=cp,
                                         cell_clip=cell_clip,
                                         gate_dtype=gate_dtype)
        # gate residuals stream out in the weights' dtype (bf16 mode
        # halves this ~75 MB/chunk write + the backward's re-read)
        gifo_ref[k] = jnp.concatenate([g, i, f, o],
                                      axis=-1).astype(gifo_ref.dtype)
        c_ref[k] = c
        r_ref[k] = r
    c_s[:] = c
    r_s[:] = r


def _fwd_in_specs(st, tb, cp, rp, ip, mask):
    def idx_tsx(s, t):
        return (t, s, 0)

    specs = [
        pl.BlockSpec((tb, st, ip), idx_tsx, memory_space=pltpu.VMEM),
        pl.BlockSpec((ip, 4 * cp), lambda s, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4 * cp), lambda s, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, 4 * cp), lambda s, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cp, rp), lambda s, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, cp), lambda s, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((st, cp), lambda s, t: (s, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((st, rp), lambda s, t: (s, 0),
                     memory_space=pltpu.VMEM),
    ]
    if mask:
        specs.append(pl.BlockSpec((tb, st, 4 * cp), idx_tsx,
                                  memory_space=pltpu.VMEM))
    return specs


def _fwd_call(x_p, wxb, bias, wr, wcr, peep, c0, r0, mask_p=None, *,
              st: int, tb: int, cell_clip: float, inv_keep: float = 1.0,
              interpret: bool, hoist_xw: bool | None = None):
    T, sp, ip = x_p.shape
    c4p = wxb.shape[1]
    cp = c4p // 4
    rp = wr.shape[0]
    grid = (sp // st, T // tb)
    if hoist_xw is None:
        hoist_xw = _HOIST_XW

    def idx_tsx(s, t):
        return (t, s, 0)

    operands = [x_p, wxb, bias, wr, wcr, peep, c0, r0]
    if mask_p is not None:
        operands.append(mask_p)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cp=cp, tb=tb, cell_clip=cell_clip,
                          has_mask=mask_p is not None, inv_keep=inv_keep,
                          hoist_xw=hoist_xw, gate_dtype=_gate_dtype()),
        grid=grid,
        in_specs=_fwd_in_specs(st, tb, cp, rp, ip, mask_p is not None),
        out_specs=[
            pl.BlockSpec((tb, st, 4 * cp), idx_tsx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, st, cp), idx_tsx, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, st, rp), idx_tsx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, sp, 4 * cp), wr.dtype),
            jax.ShapeDtypeStruct((T, sp, cp), jnp.float32),
            jax.ShapeDtypeStruct((T, sp, rp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((st, cp), jnp.float32),
            pltpu.VMEM((st, rp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)


def _infer_kernel(x_ref, wxb_ref, bias_ref, wr_ref, wcr_ref, peep_ref,
                  c0_ref, r0_ref, *rest, cp: int, tb: int,
                  cell_clip: float, has_mask: bool, inv_keep: float,
                  hoist_xw: bool = False, gate_dtype=None):
    """Inference-only forward: fused input projection, no gate/cell
    residual writes (those cost ~5x the r output in HBM bandwidth)."""
    if has_mask:
        mask_ref, r_ref, cT_ref, c_s, r_s = rest
    else:
        r_ref, cT_ref, c_s, r_s = rest
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        c_s[:] = c0_ref[:]
        r_s[:] = r0_ref[:]

    wdt = wr_ref.dtype
    c = c_s[:]
    r = r_s[:]
    st = c_s.shape[0]
    xw_all = _hoisted_xw(x_ref, wxb_ref, tb, st, cp) if hoist_xw \
        else None
    for k in range(tb):
        if hoist_xw:
            xw = xw_all[k]
        else:
            xw = jnp.dot(x_ref[k].astype(wdt), wxb_ref[:],
                         preferred_element_type=jnp.float32)
        if has_mask:
            xw = xw * (mask_ref[k].astype(jnp.float32) * inv_keep)
        xw = xw + bias_ref[0:1, :]
        _, _, _, _, c, r = _cell_forward(xw, c, r, wr_ref, wcr_ref,
                                         peep_ref, cp=cp,
                                         cell_clip=cell_clip,
                                         gate_dtype=gate_dtype)
        r_ref[k] = r
    cT_ref[:] = c
    c_s[:] = c
    r_s[:] = r


def _infer_call(x_p, wxb, bias, wr, wcr, peep, c0, r0, mask_p=None, *,
                st: int, tb: int, cell_clip: float,
                inv_keep: float = 1.0, interpret: bool,
                hoist_xw: bool | None = None):
    T, sp, ip = x_p.shape
    c4p = wxb.shape[1]
    cp = c4p // 4
    rp = wr.shape[0]
    if hoist_xw is None:
        hoist_xw = _HOIST_XW

    operands = [x_p, wxb, bias, wr, wcr, peep, c0, r0]
    if mask_p is not None:
        operands.append(mask_p)
    return pl.pallas_call(
        functools.partial(_infer_kernel, cp=cp, tb=tb,
                          cell_clip=cell_clip,
                          has_mask=mask_p is not None, inv_keep=inv_keep,
                          hoist_xw=hoist_xw, gate_dtype=_gate_dtype()),
        grid=(sp // st, T // tb),
        in_specs=_fwd_in_specs(st, tb, cp, rp, ip, mask_p is not None),
        out_specs=[
            pl.BlockSpec((tb, st, rp), lambda s, t: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((st, cp), lambda s, t: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, sp, rp), jnp.float32),
            jax.ShapeDtypeStruct((sp, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((st, cp), jnp.float32),
            pltpu.VMEM((st, rp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _contract0(a, b):
    """a [st, M], b [st, N] -> [M, N], contracting the stream axis (the
    per-step slice of a weight-gradient GEMM)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bwd_kernel(gifo_ref, c_ref, cbnd_ref, gr_ref, x_ref, r_ref,
                rbnd_ref, wgr_ref, wrm_ref, wxp_ref, peep_ref, gcT_ref,
                *rest, cp: int, tb: int, has_mask: bool, inv_keep: float,
                need_dx: bool, batch_grads: bool = False):
    """Reverse recurrence with IN-VMEM weight-gradient accumulation.

    The reference (and kernel v1/v2) materializes per-t gate gradients to
    memory and runs hoisted [T*S] GEMMs (…streams.h:465-487) — on TPU
    that costs a ~100 MB dgifo stream written then re-read 4x. Here the
    dW/dbias/dpeephole accumulators live in constant-index output blocks
    (resident in VMEM across the whole grid, ≥120 MB on v5e); each grid
    step processes tb timesteps, contracting each step's [st, ·] slices
    into LOCAL accumulators and flushing once per block — the only per-t
    output is dx (skipped entirely with need_dx=False, e.g. when the
    layer's input is the feature batch).

    v4: c(t-1)/r(t-1) are the block's own c/r rows shifted by one, plus a
    single boundary row per block (cbnd/rbnd) — the shifted streams are
    never materialized in HBM nor streamed twice (v3 cost two full
    [T, sp, .] concat copies + reads).
    """
    if has_mask:
        mask_ref, *rest = rest
    else:
        mask_ref = None
    if need_dx:
        dx_ref, *rest = rest
    else:
        dx_ref = None
    (dwx_ref, dwr_ref, dwrm_ref, dbias_ref, dpeep_ref,
     dc0_ref, dr0_ref, dc_s, dr_s) = rest
    s = pl.program_id(0)
    t = pl.program_id(1)     # time-block 0..T/tb-1, mapped to real blocks
    #                          T/tb-1-t by idx_rev; inner k runs reversed

    @pl.when(t == 0)
    def _():
        dc_s[:] = gcT_ref[:]      # cotangent of the final carried c
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
    # batch_grads (KLT_LSTM_BATCH_GRADS): collect per-t cotangent
    # slices and run each weight-gradient contraction ONCE per grid
    # step over [tb*st] rows instead of tb times over [st] — fewer,
    # better-shaped MXU ops off the sequential chain (same hypothesis
    # as the fwd hoist_xw; identical FLOPs, f32 sum order changes)
    stks: dict = {"dxw": [], "dgifo": [], "drt": [], "ho": []}
    for k in reversed(range(tb)):
        g = gifo_ref[k, :, 0 * cp:1 * cp].astype(jnp.float32)
        i = gifo_ref[k, :, 1 * cp:2 * cp].astype(jnp.float32)
        f = gifo_ref[k, :, 2 * cp:3 * cp].astype(jnp.float32)
        o = gifo_ref[k, :, 3 * cp:4 * cp].astype(jnp.float32)
        c = c_ref[k]
        c_prev = c_ref[k - 1] if k > 0 else cbnd_ref[0]
        r_prev = r_ref[k - 1] if k > 0 else rbnd_ref[0]
        h = jnp.tanh(c)

        dr_total = gr_ref[k] + dr
        dm = jnp.dot(dr_total.astype(wdt), wrm_ref[:],
                     preferred_element_type=jnp.float32)
        dh = dm * o
        dc_from_h = dh * (1.0 - h * h)
        do = dm * h * o * (1.0 - o)
        # straight-through clip: d_c flows through the forward clip
        # unchanged (reference backward reads clipped activations but
        # never masks d_c)
        dc_total = dc + dc_from_h + do * peep_ref[2:3, :]
        df = dc_total * c_prev * f * (1.0 - f)
        di = dc_total * g * i * (1.0 - i)
        dg = dc_total * i * (1.0 - g * g)
        dgifo = jnp.concatenate([dg, di, df, do], axis=-1)

        dc = dc_total * f + di * peep_ref[0:1, :] + df * peep_ref[1:2, :]
        dr = jnp.dot(dgifo.astype(wdt), wgr_ref[:],
                     preferred_element_type=jnp.float32)

        if has_mask:
            # dropout gates only the input-projection branch of gifo:
            # dx/dWx see dgifo * mask/keep, the recurrent (dr_s, dWr)
            # and bias paths the undropped dgifo
            dxw = dgifo * (mask_ref[k].astype(jnp.float32) * inv_keep)
        else:
            dxw = dgifo
        if batch_grads:
            stks["dxw"].append(dxw)
            stks["dgifo"].append(dgifo)
            stks["drt"].append(dr_total)
            stks["ho"].append(h * o)
        else:
            if need_dx:
                dx_ref[k] = jnp.dot(dxw.astype(wdt), wxp_ref[:],
                                    preferred_element_type=jnp.float32)
            acc_dwx += _contract0(dxw.astype(wdt), x_ref[k].astype(wdt))
            acc_dwr += _contract0(dgifo.astype(wdt),
                                  r_prev.astype(wdt))
            acc_dwrm += _contract0(dr_total.astype(wdt),
                                   (h * o).astype(wdt))
        acc_dbias += jnp.sum(dgifo, axis=0, keepdims=True)
        acc_dpi += jnp.sum(di * c_prev, axis=0, keepdims=True)
        acc_dpf += jnp.sum(df * c_prev, axis=0, keepdims=True)
        acc_dpo += jnp.sum(do * c, axis=0, keepdims=True)

    if batch_grads:
        st = dc_s.shape[0]
        rp = dr_s.shape[1]
        ip = x_ref.shape[2]
        # slices were appended in REVERSED k order; contraction sums are
        # order-independent, only dx must land at the right rows
        dxw_all = jnp.stack(stks["dxw"][::-1]).reshape(tb * st, 4 * cp)
        dgifo_all = jnp.stack(stks["dgifo"][::-1]) \
            .reshape(tb * st, 4 * cp)
        drt_all = jnp.stack(stks["drt"][::-1]).reshape(tb * st, rp)
        ho_all = jnp.stack(stks["ho"][::-1]).reshape(tb * st, cp)
        if need_dx:
            dx_ref[:] = jnp.dot(
                dxw_all.astype(wdt), wxp_ref[:],
                preferred_element_type=jnp.float32) \
                .reshape(tb, st, ip)
        x_all = x_ref[:].reshape(tb * st, ip)
        # r_prev rows for the block: boundary row then r[0..tb-2]
        rprev_all = jnp.concatenate(
            [rbnd_ref[:], r_ref[0:tb - 1]] if tb > 1
            else [rbnd_ref[:]], axis=0).reshape(tb * st, rp)
        acc_dwx = _contract0(dxw_all.astype(wdt), x_all.astype(wdt))
        acc_dwr = _contract0(dgifo_all.astype(wdt),
                             rprev_all.astype(wdt))
        acc_dwrm = _contract0(drt_all.astype(wdt), ho_all.astype(wdt))

    dc_s[:] = dc
    dr_s[:] = dr
    dwx_ref[:] += acc_dwx
    dwr_ref[:] += acc_dwr
    dwrm_ref[:] += acc_dwrm
    dbias_ref[0:1, :] += acc_dbias
    dpeep_ref[0:1, :] += acc_dpi
    dpeep_ref[1:2, :] += acc_dpf
    dpeep_ref[2:3, :] += acc_dpo

    # after the last step (real t=0) the carries are the state gradients;
    # constant-index output blocks flush their final contents
    dc0_ref[:] = dc
    dr0_ref[:] = dr


def _bwd_call(gifo, c_seq, c_bnd, g_r, x_pad, r_seq, r_bnd, wgr, wrm,
              wxp, peep, gcT, keep_mask=None, *, st: int, tb: int,
              inv_keep: float = 1.0, need_dx: bool = True,
              interpret: bool):
    T, sp, c4p = gifo.shape
    cp = c4p // 4
    rp = g_r.shape[2]
    ip = x_pad.shape[2]
    grid = (sp // st, T // tb)

    def idx_rev(s, t):
        return (T // tb - 1 - t, s, 0)

    def idx_bnd(s, t):
        return (T // tb - 1 - t, s, 0)

    def idx_const(s, t):
        return (0, 0)

    def idx_s(s, t):
        return (s, 0)

    in_specs = [
        pl.BlockSpec((tb, st, 4 * cp), idx_rev,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, st, cp), idx_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, st, cp), idx_bnd, memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, st, rp), idx_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, st, ip), idx_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, st, rp), idx_rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, st, rp), idx_bnd, memory_space=pltpu.VMEM),
        pl.BlockSpec((4 * cp, rp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, cp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((4 * cp, ip), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, cp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((st, cp), idx_s, memory_space=pltpu.VMEM),
    ]
    operands = [gifo, c_seq, c_bnd, g_r, x_pad, r_seq, r_bnd, wgr, wrm,
                wxp, peep, gcT]
    if keep_mask is not None:
        in_specs.append(pl.BlockSpec((tb, st, 4 * cp), idx_rev,
                                     memory_space=pltpu.VMEM))
        operands.append(keep_mask)
    out_specs = [
        pl.BlockSpec((4 * cp, ip), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((4 * cp, rp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, cp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 4 * cp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, cp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((st, cp), idx_s, memory_space=pltpu.VMEM),
        pl.BlockSpec((st, rp), idx_s, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((4 * cp, ip), jnp.float32),  # dWx
        jax.ShapeDtypeStruct((4 * cp, rp), jnp.float32),  # dWr
        jax.ShapeDtypeStruct((rp, cp), jnp.float32),      # dWrm
        jax.ShapeDtypeStruct((8, 4 * cp), jnp.float32),   # dbias (row 0)
        jax.ShapeDtypeStruct((8, cp), jnp.float32),       # dpeep (rows 0-2)
        jax.ShapeDtypeStruct((sp, cp), jnp.float32),      # dc0
        jax.ShapeDtypeStruct((sp, rp), jnp.float32),      # dr0
    ]
    if need_dx:
        out_specs.insert(0, pl.BlockSpec((tb, st, ip), idx_rev,
                                         memory_space=pltpu.VMEM))
        out_shape.insert(0, jax.ShapeDtypeStruct((T, sp, ip),
                                                 jnp.float32))
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, cp=cp, tb=tb,
                          has_mask=keep_mask is not None,
                          inv_keep=inv_keep, need_dx=need_dx,
                          batch_grads=_batch_grads()),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((st, cp), jnp.float32),
            pltpu.VMEM((st, rp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
    if not need_dx:
        out = [None] + list(out)
    return out


# ---------------------------------------------------------------------------
# padding helpers
# ---------------------------------------------------------------------------

class _Dims(NamedTuple):
    S: int
    T: int
    I: int
    C: int
    R: int
    sp: int   # padded streams
    st: int   # stream tile
    cp: int   # padded cell dim
    rp: int   # padded recurrent dim
    tb: int   # timesteps per grid step (divides T)
    ip: int   # padded input dim


import os

# Stream-tile size: bigger tiles feed the MXU fuller rows (128 = full
# sublane tile) at the cost of VMEM; overridable for tuning.
_DEFAULT_STREAM_TILE = int(os.environ.get("KLT_LSTM_STREAM_TILE", "128"))
# Timesteps per grid step (statically unrolled inside the kernel); the
# actual block is the largest divisor of T not exceeding this. Amortizes
# per-grid-step pipeline overhead; VMEM per block scales linearly.
_DEFAULT_TIME_BLOCK = int(os.environ.get("KLT_LSTM_TIME_BLOCK", "5"))
_VMEM_LIMIT = int(os.environ.get("KLT_LSTM_VMEM_LIMIT",
                                 str(100 * 1024 * 1024)))
# Block-hoisted input projection inside the fwd/infer kernels (one
# [tb*st, ip] GEMM per grid step instead of tb per-timestep dots);
# KLT_LSTM_HOIST_XW=1/0 forces — A/B'd in tools_dev/bench_lstm_variants.
_HOIST_XW = os.environ.get("KLT_LSTM_HOIST_XW", "0") == "1"


def _batch_grads() -> bool:
    # Block-batched backward weight-gradient contractions (one [tb*st]
    # contraction per grid step instead of tb per-t ones) —
    # experimental knob, A/B'd with the fwd hoist (read at trace time
    # so tests can toggle).
    return os.environ.get("KLT_LSTM_BATCH_GRADS", "0") == "1"


def _gate_dtype():
    """KLT_LSTM_GATE_DTYPE=bf16: timing-ablation knob for the gate
    elementwise chain (see _cell_forward)."""
    v = os.environ.get("KLT_LSTM_GATE_DTYPE", "")
    return jnp.bfloat16 if v in ("bf16", "bfloat16") else None


def _plan_time_block(T: int, max_tb: int) -> int:
    for tb in range(min(max_tb, T), 0, -1):
        if T % tb == 0:
            return tb
    return 1


def _fwd_vmem_bytes(tb, st, cp, rp, ip, gifo_bytes=4,
                    has_mask: bool = False) -> int:
    """Analytic VMEM footprint of one fwd grid step (double-buffered
    streams + resident weights incl. the fused input projection +
    outputs + scratch)."""
    stream_in = tb * st * ip * 4 * 2
    if has_mask:
        stream_in += tb * st * 4 * cp * 1 * 2
    weights = (ip * 4 * cp + 4 * cp + rp * 4 * cp + cp * rp
               + 3 * cp) * 4
    state_in = st * (cp + rp) * 4 * 2
    outs = tb * st * (4 * cp * gifo_bytes + cp * 4 + rp * 4) * 2
    scratch = st * (cp + rp) * 4
    return stream_in + weights + state_in + outs + scratch


def _bwd_vmem_bytes(tb, st, cp, rp, ip, gifo_bytes=4,
                    need_dx: bool = True,
                    has_mask: bool = False) -> int:
    """Analytic VMEM footprint of one bwd grid step: double-buffered
    per-t streams (c/r blocks + one boundary row each), resident weights,
    resident accumulator output blocks PLUS the same-sized local
    accumulators, dx out, state blocks."""
    stream_in = tb * st * (4 * cp * gifo_bytes
                           + (cp + 2 * rp + ip) * 4) * 2
    if has_mask:
        stream_in += tb * st * 4 * cp * 1 * 2   # int8 dropout mask
    boundary = st * (cp + rp) * 4 * 2
    weights = (4 * cp * rp + rp * cp + 4 * cp * ip + 3 * cp) * 4
    accum = (4 * cp * ip + 4 * cp * rp + rp * cp
             + 8 * 4 * cp + 8 * cp) * 4 * 2  # output blocks + locals
    dx_out = tb * st * ip * 4 * 2 if need_dx else 0
    state = st * (cp + rp) * 4 * 4  # gcT in, dc0/dr0 out, scratch
    return stream_in + boundary + weights + accum + dx_out + state


def _fit_time_block(T: int, tb: int, bytes_fn) -> int:
    """Largest divisor of T <= tb whose estimated footprint fits the
    VMEM limit. The 1.35 slack is calibrated against a measured Mosaic
    stack allocation (108 MiB actual vs 86 MiB estimated at the deep
    config's I=512 backward)."""
    while tb > 1 and bytes_fn(tb) * 1.35 > _VMEM_LIMIT:
        tb = _plan_time_block(T, tb - 1)
    return tb


def _plan_dims(S, T, I, C, R, max_stream_tile=None,
               max_time_block=None, has_mask: bool = False) -> _Dims:
    if max_stream_tile is None:
        max_stream_tile = _DEFAULT_STREAM_TILE
    # sublane tiles must be multiples of 8; a ragged KLT_LSTM_STREAM_TILE
    # would otherwise make sp indivisible by every 8-multiple tile
    max_stream_tile = max(8, (max_stream_tile // 8) * 8)
    if max_time_block is None:
        max_time_block = _DEFAULT_TIME_BLOCK
    cp = _round_up(C, 128)
    rp = _round_up(R, 128)
    ip = _round_up(I, 128)
    sp = _round_up(S, 8)
    st = sp if sp <= max_stream_tile else max_stream_tile
    sp = _round_up(sp, st)
    tb = _plan_time_block(T, max_time_block)
    tb = _fit_time_block(
        T, tb, lambda t: _fwd_vmem_bytes(t, st, cp, rp, ip,
                                         has_mask=has_mask))
    return _Dims(S, T, I, C, R, sp, st, cp, rp, tb, ip)


def _pad_gate_mat(w, cp):
    """[4C, X] -> [4cp, X]: pad each of the g,i,f,o blocks to cp rows."""
    C4, X = w.shape
    C = C4 // 4
    w = w.reshape(4, C, X)
    w = jnp.pad(w, ((0, 0), (0, cp - C), (0, 0)))
    return w.reshape(4 * cp, X)


def _pad2(w, rows, cols):
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, cols - w.shape[1])))


# ---------------------------------------------------------------------------
# custom-VJP public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _lstm_pallas(params: LstmParams, x, state: LstmState, keep_mask,
                 cell_clip: float, interpret: bool, time_major: bool,
                 inv_keep: float, need_input_grad: bool):
    # primal = inference path (custom_vjp only calls _lstm_pallas_fwd
    # under differentiation): skip all residual outputs
    if time_major:
        T, S, I = x.shape
    else:
        S, T, I = x.shape
    d = _plan_dims(S, T, I, params.cell_dim, params.recur_dim,
                   has_mask=keep_mask is not None)
    ops = _prepare(params, x, state, d, time_major, keep_mask)
    r_seq, c_last = _infer_call(*ops, st=d.st, tb=d.tb,
                                cell_clip=cell_clip, inv_keep=inv_keep,
                                interpret=interpret)
    out = r_seq[:, :S, :params.recur_dim]
    if not time_major:
        out = out.swapaxes(0, 1)
    final = LstmState(c=c_last[:S, :params.cell_dim],
                      r=r_seq[T - 1, :S, :params.recur_dim])
    return out, final


def _pad_mask_tm(keep_mask, d: _Dims, time_major: bool):
    """bool [S,T,4C]/[T,S,4C] keep-mask -> [T, sp, 4cp] int8 (per-gate
    padding along the 4C axis, like _pad_gate_mat)."""
    m = keep_mask if time_major else keep_mask.swapaxes(0, 1)
    m = m.reshape(d.T, d.S, 4, d.C).astype(jnp.int8)
    m = jnp.pad(m, ((0, 0), (0, d.sp - d.S), (0, 0), (0, d.cp - d.C)))
    return m.reshape(d.T, d.sp, 4 * d.cp)


def _prepare(params: LstmParams, x, state: LstmState, d: _Dims,
             time_major: bool = False, keep_mask=None):
    """Pad operands to tile shapes for the FUSED forward kernels;
    returns (x_p, wxb, bias, wr, wcr, peep, c0, r0, mask_p).

    The input projection (reference's hoisted GEMM, :246-259) runs
    inside the kernel against the resident [ip, 4cp] W_gifo_x^T — only
    the raw [T, S, I] features stream from HBM (~1.6 MB vs the ~150 MB
    pre-activation stream at the flagship shape)."""
    from kaldi_lstm_tpu.models.components import get_matmul_dtype
    mm_dt = get_matmul_dtype()
    x_tm = x if time_major else x.swapaxes(0, 1)            # [T, S, I]
    x_p = jnp.pad(x_tm, ((0, 0), (0, d.sp - d.S), (0, d.ip - d.I)))
    wxb = _pad_gate_mat(params.w_gifo_x, d.cp)              # [4cp, I]
    wxb = jnp.pad(wxb, ((0, 0), (0, d.ip - d.I))).T         # [ip, 4cp]
    bias = jnp.pad(params.bias.reshape(4, d.C),
                   ((0, 0), (0, d.cp - d.C))).reshape(1, 4 * d.cp)
    wr = _pad_gate_mat(params.w_gifo_r, d.cp)               # [4cp, R]
    wr = _pad2(wr, 4 * d.cp, d.rp).T                        # [rp, 4cp]
    wcr = _pad2(params.w_r_m, d.rp, d.cp).T                 # [cp, rp]
    if mm_dt is not None:
        x_p = x_p.astype(mm_dt)
        wxb = wxb.astype(mm_dt)
        wr = wr.astype(mm_dt)
        wcr = wcr.astype(mm_dt)
    peep = jnp.stack([params.peephole_i_c, params.peephole_f_c,
                      params.peephole_o_c])
    peep = jnp.pad(peep, ((0, 0), (0, d.cp - d.C)))         # [3, cp]
    c0 = _pad2(state.c, d.sp, d.cp)
    r0 = _pad2(state.r, d.sp, d.rp)
    mask_p = None if keep_mask is None \
        else _pad_mask_tm(keep_mask, d, time_major)
    return x_p, wxb, bias, wr, wcr, peep, c0, r0, mask_p


def _lstm_pallas_fwd(params: LstmParams, x, state: LstmState,
                     keep_mask, cell_clip: float, interpret: bool,
                     time_major: bool, inv_keep: float,
                     need_input_grad: bool):
    if time_major:
        T, S, I = x.shape
    else:
        S, T, I = x.shape
    C = params.cell_dim
    R = params.recur_dim
    d = _plan_dims(S, T, I, C, R, has_mask=keep_mask is not None)

    ops = _prepare(params, x, state, d, time_major, keep_mask)
    c0, r0 = ops[6], ops[7]
    gifo, c_seq, r_seq = _fwd_call(*ops, st=d.st, tb=d.tb,
                                   cell_clip=cell_clip,
                                   inv_keep=inv_keep,
                                   interpret=interpret)

    out = r_seq[:, :S, :R]
    if not time_major:
        out = out.swapaxes(0, 1)                            # [S, T, R]
    final = LstmState(c=c_seq[T - 1, :S, :C], r=r_seq[T - 1, :S, :R])
    residuals = (params, x, gifo, c_seq, r_seq, c0, r0, keep_mask)
    return (out, final), residuals


def _lstm_pallas_bwd(cell_clip, interpret, time_major, inv_keep,
                     need_input_grad, residuals, cotangents):
    params, x, gifo, c_seq, r_seq, c0, r0, keep_mask = residuals
    g_out, g_final = cotangents
    if time_major:
        T, S, I = x.shape
    else:
        S, T, I = x.shape
    C = params.cell_dim
    R = params.recur_dim
    d = _plan_dims(S, T, I, C, R, has_mask=keep_mask is not None)

    # r_T == r_seq[T-1]: fold its extra cotangent into the sequence grad
    g_r = jnp.zeros((T, d.sp, d.rp), jnp.float32)
    g_r = g_r.at[:, :S, :R].set(g_out if time_major
                                else g_out.swapaxes(0, 1))
    g_r = g_r.at[T - 1, :S, :R].add(g_final.r)
    gcT = jnp.zeros((d.sp, d.cp), jnp.float32)
    gcT = gcT.at[:S, :C].set(g_final.c)

    from kaldi_lstm_tpu.models.components import get_matmul_dtype
    mm_dt = get_matmul_dtype()
    wgr = _pad_gate_mat(params.w_gifo_r, d.cp)              # [4cp, R]
    wgr = _pad2(wgr, 4 * d.cp, d.rp)                        # [4cp, rp]
    wrm = _pad2(params.w_r_m, d.rp, d.cp)                   # [rp, cp]
    if mm_dt is not None:
        wgr = wgr.astype(mm_dt)
        wrm = wrm.astype(mm_dt)
    peep = jnp.stack([params.peephole_i_c, params.peephole_f_c,
                      params.peephole_o_c])
    peep = jnp.pad(peep, ((0, 0), (0, d.cp - d.C)))

    ip = _round_up(I, 128)
    x_tm = x if time_major else x.swapaxes(0, 1)
    x_pad = jnp.pad(x_tm,
                    ((0, 0), (0, d.sp - S), (0, ip - I)))     # [T, sp, ip]
    wxp = _pad_gate_mat(params.w_gifo_x, d.cp)                # [4cp, I]
    wxp = jnp.pad(wxp, ((0, 0), (0, ip - I)))                 # [4cp, ip]
    if mm_dt is not None:
        wxp = wxp.astype(mm_dt)

    st_bwd = min(d.st, 128)
    while st_bwd > 8 and d.sp % st_bwd:
        # st_bwd must DIVIDE sp or the backward grid under-covers the
        # streams (silent gradient loss with KLT_LSTM_STREAM_TILE > 128);
        # _plan_dims rounds the tile to a multiple of 8, so 8 divides sp
        st_bwd -= 8
    gifo_bytes = jnp.dtype(gifo.dtype).itemsize
    tb_bwd = _fit_time_block(
        T, d.tb, lambda t: _bwd_vmem_bytes(t, st_bwd, d.cp, d.rp, ip,
                                           gifo_bytes, need_input_grad,
                                           keep_mask is not None))
    # per-block boundary rows: c/r at index tau*tb-1 (tau=0 -> the chunk
    # carry) — the kernel shifts within the block, so the full c(t-1)/
    # r(t-1) streams are never materialized (v3 cost two [T, sp, .]
    # concats + duplicate kernel reads)
    c_bnd = jnp.concatenate([c0[None], c_seq[tb_bwd - 1::tb_bwd][:-1]], 0)
    r_bnd = jnp.concatenate([r0[None], r_seq[tb_bwd - 1::tb_bwd][:-1]], 0)
    mask_p = None if keep_mask is None \
        else _pad_mask_tm(keep_mask, d, time_major)
    (dx_p, dwx_p, dwr_p, dwrm_p, dbias_p, dpeep_p, dc0_p, dr0_p) = \
        _bwd_call(gifo, c_seq, c_bnd, g_r, x_pad, r_seq, r_bnd,
                  wgr, wrm, wxp, peep, gcT, mask_p, st=st_bwd, tb=tb_bwd,
                  inv_keep=inv_keep, need_dx=need_input_grad,
                  interpret=interpret)

    def unpad_gates_rows(w_p):  # [4cp, X] -> [4C, X]
        return w_p.reshape(4, d.cp, -1)[:, :C].reshape(4 * C, -1)

    dparams = LstmParams(
        w_gifo_x=unpad_gates_rows(dwx_p)[:, :I],
        w_gifo_r=unpad_gates_rows(dwr_p)[:, :R],
        bias=unpad_gates_rows(dbias_p[0:1, :].T)[:, 0],
        peephole_i_c=dpeep_p[0, :C],
        peephole_f_c=dpeep_p[1, :C],
        peephole_o_c=dpeep_p[2, :C],
        w_r_m=dwrm_p[:R, :C],
    )
    if need_input_grad:
        dx = dx_p[:, :S, :I]
        if not time_major:
            dx = dx.swapaxes(0, 1)
    else:
        # symbolically-zero input grad (e.g. the LSTM is the first layer
        # and x is the feature batch): XLA folds the zeros away
        dx = jnp.zeros_like(x)
    dstate = LstmState(c=dc0_p[:S, :C], r=dr0_p[:S, :R])
    return dparams, dx, dstate, None  # bool mask: zero cotangent


_lstm_pallas.defvjp(_lstm_pallas_fwd, _lstm_pallas_bwd)


def lstm_scan_pallas(params: LstmParams, x, state: LstmState,
                     cell_clip: float = 50.0,
                     interpret: bool | None = None,
                     time_major: bool = False,
                     gate_keep_mask=None, keep_prob: float = 1.0,
                     need_input_grad: bool = True
                     ) -> tuple[jax.Array, LstmState]:
    """Drop-in replacement for `lstm_cell.lstm_scan` backed by the fused
    Pallas kernels. `interpret=None` auto-selects interpreter mode off-TPU
    (for CPU tests). With ``time_major=True`` input/output are [T, S, .]
    (the kernels' native layout) and no big-tensor transposes happen at
    all.

    ``gate_keep_mask`` (bool, same leading layout as x, last dim 4C)
    enables inverted gate dropout on the input projection: kept
    pre-activations scale by 1/keep_prob. The mask streams into the
    backward kernel as int8 to gate the dx/dWx path only (the recurrent
    and bias paths see the undropped gradient, matching lstm_scan's
    autodiff)."""
    if interpret is None:
        # _on_tpu handles bridged platforms whose backend name may not
        # be 'tpu' (same detector as the component dispatch and the
        # fused-xent kernel)
        from kaldi_lstm_tpu.models.components import _on_tpu
        interpret = not _on_tpu()
    inv_keep = 1.0 if keep_prob >= 1.0 else 1.0 / keep_prob
    return _lstm_pallas(params, x, state, gate_keep_mask, cell_clip,
                        interpret, time_major, inv_keep,
                        need_input_grad)
