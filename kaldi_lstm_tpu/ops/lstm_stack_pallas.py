"""Wavefront-fused Pallas kernel for a 2-layer projected-LSTM stack.

The deep config (2x LSTMP -> 16624 senones, the reference's own decode
example, /root/reference/README.md:38-44) pays TWO serial recurrences
when the layers run as separate kernels: layer 2 cannot start timestep t
before layer 1 produces r1(t). Per *chunk* that serialization is not
inherent — the classic cuDNN multi-layer trick runs a staircase
(wavefront) schedule where layer 2 processes time block k-1 while
layer 1 processes block k.

This kernel implements that schedule in ONE pallas_call:

* grid (S_tiles, K+1) with K = T/tb time blocks; at grid step k the
  layer-1 phase computes block k (guarded k < K) and the layer-2 phase
  computes block k-1 (guarded k > 0);
* the two phases are FULLY independent within a grid step: layer 2
  consumes r1 of block k-1 from a VMEM ring buffer written by layer 1
  during the PREVIOUS grid step — maximal freedom for Mosaic to
  overlap layer-2 VPU gate math with layer-1 MXU dots (and vice
  versa);
* layer 2's input projection is hoisted to one [tb*st, rp] x [rp, 4cp]
  GEMM per grid step (off the sequential chain), where the serial
  schedule pays it per-timestep inside the recurrence;
* both layers' weights stay resident in VMEM across the whole grid.

Whether Mosaic actually converts the code-level independence into
MXU/VPU overlap is an empirical question — a round-1 experiment
(tools_dev/bench_interleave.py) found it does NOT for two half-stream
tiles of the same layer. tools_dev/bench_wavefront.py measures this
kernel against the serial two-kernel schedule; see BENCH_NOTES.

Layouts/padding conventions follow ops/lstm_pallas.py (time-major
[T, S, .] inside; Kaldi weight orientation; g,i,f,o gate order). The
two layers must share cell/recurrent dims (cp, rp) — true for the deep
config.

STATUS: experimental / bench-only. The measured result is NEGATIVE
(BENCH_NOTES round 4: serial 0.828 ms vs wavefront 0.861-0.911 ms on
device — phases overlap ~40% but per-phase cost inflates by the same),
so no model/forward path dispatches here; the model stack always runs
the serial per-layer kernels. Exercised by tests/test_lstm_stack.py and
tools_dev/bench_wavefront.py only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kaldi_lstm_tpu.ops.lstm_cell import LstmParams, LstmState
from kaldi_lstm_tpu.ops.lstm_pallas import (
    _VMEM_LIMIT,
    _cell_forward,
    _Dims,
    _pad2,
    _pad_gate_mat,
    _plan_dims,
    _prepare,
)


# ---------------------------------------------------------------------------
# forward (training) wavefront kernel
# ---------------------------------------------------------------------------

def _fwd2_kernel(x_ref, wxb1_ref, bias1_ref, wr1_ref, wcr1_ref, peep1_ref,
                 wxb2_ref, bias2_ref, wr2_ref, wcr2_ref, peep2_ref,
                 c01_ref, r01_ref, c02_ref, r02_ref,
                 gifo1_ref, c1_ref, r1_ref, gifo2_ref, c2_ref, r2_ref,
                 c1_s, r1_s, c2_s, r2_s, ring_s, *,
                 cp: int, tb: int, K: int, cell_clip: float,
                 phases: str = "both"):
    """`phases` ('both' | 'l1' | 'l2') statically disables one phase —
    an ABLATION knob for tools_dev/bench_wavefront.py only: if
    t(both) = t(l1) + t(l2), Mosaic executes the two independent
    phases strictly serially (no MXU/VPU overlap across them). Outputs
    of a disabled phase are garbage."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        c1_s[:] = c01_ref[:]
        r1_s[:] = r01_ref[:]
        c2_s[:] = c02_ref[:]
        r2_s[:] = r02_ref[:]

    wdt = wr1_ref.dtype
    st = c1_s.shape[0]
    rp = r1_s.shape[1]

    # ---- layer-2 phase: time block k-1, r1 inputs from the ring slot
    # filled by layer 1 at grid step k-1. Independent of this step's
    # layer-1 phase.
    @pl.when((k > 0) & (phases != "l1"))
    def _():
        slot = jax.lax.rem(k - 1, 2)
        r1_blk = ring_s[slot]                       # [tb, st, rp] f32
        # hoisted input projection for the whole block: one
        # [tb*st, rp] x [rp, 4cp] GEMM off the sequential chain (the
        # serial schedule pays this per-timestep inside its recurrence)
        xw2 = jnp.dot(r1_blk.reshape(tb * st, rp).astype(wdt),
                      wxb2_ref[:], preferred_element_type=jnp.float32)
        xw2 = xw2.reshape(tb, st, 4 * cp)
        c2 = c2_s[:]
        r2 = r2_s[:]
        for j in range(tb):
            g, i, f, o, c2, r2 = _cell_forward(
                xw2[j] + bias2_ref[0:1, :], c2, r2, wr2_ref, wcr2_ref,
                peep2_ref, cp=cp, cell_clip=cell_clip)
            gifo2_ref[j] = jnp.concatenate(
                [g, i, f, o], axis=-1).astype(gifo2_ref.dtype)
            c2_ref[j] = c2
            r2_ref[j] = r2
        c2_s[:] = c2
        r2_s[:] = r2

    # ---- layer-1 phase: time block k
    @pl.when((k < K) & (phases != "l2"))
    def _():
        slot = jax.lax.rem(k, 2)
        c1 = c1_s[:]
        r1 = r1_s[:]
        for j in range(tb):
            xw = jnp.dot(x_ref[j].astype(wdt), wxb1_ref[:],
                         preferred_element_type=jnp.float32)
            g, i, f, o, c1, r1 = _cell_forward(
                xw + bias1_ref[0:1, :], c1, r1, wr1_ref, wcr1_ref,
                peep1_ref, cp=cp, cell_clip=cell_clip)
            gifo1_ref[j] = jnp.concatenate(
                [g, i, f, o], axis=-1).astype(gifo1_ref.dtype)
            c1_ref[j] = c1
            r1_ref[j] = r1
            ring_s[slot, j] = r1
        c1_s[:] = c1
        r1_s[:] = r1


def _wave_specs(st, tb, cp, rp, ip, K):
    """Input block specs for both wavefront kernels (weights + x + four
    initial-state blocks). Every time-dependent index map is the
    IDENTITY (k, s, 0): x arrives padded with one trailing dummy block
    so grid step K reads real memory, and outputs carry one dummy
    boundary block each (layer 1 trailing, layer 2 leading). Clamped
    min/max index maps measurably inflated per-phase cost ~30-60%
    (profiled round 4: l1-only 0.55 ms vs 0.335 ms for the identical
    serial kernel) — plausibly by defeating Mosaic's block
    double-buffering."""
    def idx_x(s, k):
        return (k, s, 0)

    def idx_const(s, k):
        return (0, 0)

    def idx_s(s, k):
        return (s, 0)

    w1 = [
        pl.BlockSpec((ip, 4 * cp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4 * cp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, 4 * cp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((cp, rp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, cp), idx_const, memory_space=pltpu.VMEM),
    ]
    w2 = [
        pl.BlockSpec((rp, 4 * cp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4 * cp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, 4 * cp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((cp, rp), idx_const, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, cp), idx_const, memory_space=pltpu.VMEM),
    ]
    states = [
        pl.BlockSpec((st, cp), idx_s, memory_space=pltpu.VMEM),
        pl.BlockSpec((st, rp), idx_s, memory_space=pltpu.VMEM),
        pl.BlockSpec((st, cp), idx_s, memory_space=pltpu.VMEM),
        pl.BlockSpec((st, rp), idx_s, memory_space=pltpu.VMEM),
    ]
    return ([pl.BlockSpec((tb, st, ip), idx_x, memory_space=pltpu.VMEM)]
            + w1 + w2 + states)


def _fwd2_call(x_p, ops1, ops2, c01, r01, c02, r02, *,
               st: int, tb: int, cell_clip: float, gifo_dtype,
               interpret: bool, phases: str = "both"):
    """ops1 = (wxb1, bias1, wr1, wcr1, peep1) padded; ops2 likewise with
    wxb2 already [rp, 4cp].

    `x_p` must carry one trailing dummy time block ([T + tb, sp, ip];
    _prep2 pads it). Outputs are [T + tb, sp, .] with IDENTITY index
    maps: layer-1 arrays valid at [:T] (block K is dummy — the guarded
    final grid step), layer-2 arrays valid at [tb:T + tb] (block 0 is
    dummy — the guarded first step). Callers slice; the backward reads
    the padded layout directly."""
    Tp, sp, ip = x_p.shape
    T = Tp - tb
    cp = ops1[0].shape[1] // 4
    rp = ops1[2].shape[0]
    K = T // tb
    grid = (sp // st, K + 1)

    def idx(s, k):
        return (k, s, 0)

    out_specs = [
        pl.BlockSpec((tb, st, 4 * cp), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, st, cp), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, st, rp), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, st, 4 * cp), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, st, cp), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, st, rp), idx, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Tp, sp, 4 * cp), gifo_dtype),
        jax.ShapeDtypeStruct((Tp, sp, cp), jnp.float32),
        jax.ShapeDtypeStruct((Tp, sp, rp), jnp.float32),
        jax.ShapeDtypeStruct((Tp, sp, 4 * cp), gifo_dtype),
        jax.ShapeDtypeStruct((Tp, sp, cp), jnp.float32),
        jax.ShapeDtypeStruct((Tp, sp, rp), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_fwd2_kernel, cp=cp, tb=tb, K=K,
                          cell_clip=cell_clip, phases=phases),
        grid=grid,
        in_specs=_wave_specs(st, tb, cp, rp, ip, K),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((st, cp), jnp.float32),
            pltpu.VMEM((st, rp), jnp.float32),
            pltpu.VMEM((st, cp), jnp.float32),
            pltpu.VMEM((st, rp), jnp.float32),
            pltpu.VMEM((2, tb, st, rp), jnp.float32),  # r1 block ring
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x_p, *ops1, *ops2, c01, r01, c02, r02)


# ---------------------------------------------------------------------------
# inference wavefront kernel (no residual streams)
# ---------------------------------------------------------------------------

def _infer2_kernel(x_ref, wxb1_ref, bias1_ref, wr1_ref, wcr1_ref,
                   peep1_ref, wxb2_ref, bias2_ref, wr2_ref, wcr2_ref,
                   peep2_ref, c01_ref, r01_ref, c02_ref, r02_ref,
                   r2_ref, c1T_ref, r1T_ref, c2T_ref,
                   c1_s, r1_s, c2_s, r2_s, ring_s, *,
                   cp: int, tb: int, K: int, cell_clip: float):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        c1_s[:] = c01_ref[:]
        r1_s[:] = r01_ref[:]
        c2_s[:] = c02_ref[:]
        r2_s[:] = r02_ref[:]

    wdt = wr1_ref.dtype
    st = c1_s.shape[0]
    rp = r1_s.shape[1]

    @pl.when(k > 0)
    def _():
        slot = jax.lax.rem(k - 1, 2)
        r1_blk = ring_s[slot]
        xw2 = jnp.dot(r1_blk.reshape(tb * st, rp).astype(wdt),
                      wxb2_ref[:], preferred_element_type=jnp.float32)
        xw2 = xw2.reshape(tb, st, 4 * cp)
        c2 = c2_s[:]
        r2 = r2_s[:]
        for j in range(tb):
            _, _, _, _, c2, r2 = _cell_forward(
                xw2[j] + bias2_ref[0:1, :], c2, r2, wr2_ref, wcr2_ref,
                peep2_ref, cp=cp, cell_clip=cell_clip)
            r2_ref[j] = r2
        c2_s[:] = c2
        r2_s[:] = r2

    @pl.when(k < K)
    def _():
        slot = jax.lax.rem(k, 2)
        c1 = c1_s[:]
        r1 = r1_s[:]
        for j in range(tb):
            xw = jnp.dot(x_ref[j].astype(wdt), wxb1_ref[:],
                         preferred_element_type=jnp.float32)
            _, _, _, _, c1, r1 = _cell_forward(
                xw + bias1_ref[0:1, :], c1, r1, wr1_ref, wcr1_ref,
                peep1_ref, cp=cp, cell_clip=cell_clip)
            ring_s[slot, j] = r1
        c1_s[:] = c1
        r1_s[:] = r1

    # final carried states flush from constant-index blocks on the last
    # grid step of each stream tile
    @pl.when(k == K)
    def _():
        c1T_ref[:] = c1_s[:]
        r1T_ref[:] = r1_s[:]
        c2T_ref[:] = c2_s[:]


def _infer2_call(x_p, ops1, ops2, c01, r01, c02, r02, *,
                 st: int, tb: int, cell_clip: float, interpret: bool):
    Tp, sp, ip = x_p.shape
    T = Tp - tb
    cp = ops1[0].shape[1] // 4
    rp = ops1[2].shape[0]
    K = T // tb
    grid = (sp // st, K + 1)

    def idx(s, k):
        return (k, s, 0)

    def idx_s(s, k):
        return (s, 0)

    return pl.pallas_call(
        functools.partial(_infer2_kernel, cp=cp, tb=tb, K=K,
                          cell_clip=cell_clip),
        grid=grid,
        in_specs=_wave_specs(st, tb, cp, rp, ip, K),
        out_specs=[
            pl.BlockSpec((tb, st, rp), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((st, cp), idx_s, memory_space=pltpu.VMEM),
            pl.BlockSpec((st, rp), idx_s, memory_space=pltpu.VMEM),
            pl.BlockSpec((st, cp), idx_s, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, sp, rp), jnp.float32),
            jax.ShapeDtypeStruct((sp, cp), jnp.float32),
            jax.ShapeDtypeStruct((sp, rp), jnp.float32),
            jax.ShapeDtypeStruct((sp, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((st, cp), jnp.float32),
            pltpu.VMEM((st, rp), jnp.float32),
            pltpu.VMEM((st, cp), jnp.float32),
            pltpu.VMEM((st, rp), jnp.float32),
            pltpu.VMEM((2, tb, st, rp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x_p, *ops1, *ops2, c01, r01, c02, r02)


# ---------------------------------------------------------------------------
# operand preparation
# ---------------------------------------------------------------------------

def stack_compatible(p1: LstmParams, p2: LstmParams) -> bool:
    """The wavefront kernel requires equal cell/recurrent dims and
    layer-2 input = layer-1 output."""
    return (p1.cell_dim == p2.cell_dim
            and p1.recur_dim == p2.recur_dim
            and p2.input_dim == p1.recur_dim)


def _prep2(params1: LstmParams, params2: LstmParams, x,
           s1: LstmState, s2: LstmState, d: _Dims, time_major: bool):
    """Pad both layers' operands. Layer 1 reuses lstm_pallas._prepare;
    layer 2's input projection weight is padded to [rp, 4cp]."""
    from kaldi_lstm_tpu.models.components import get_matmul_dtype
    mm_dt = get_matmul_dtype()
    x_p, wxb1, bias1, wr1, wcr1, peep1, c01, r01, _ = _prepare(
        params1, x, s1, d, time_major)
    # one trailing dummy time block: grid step K's (guarded) layer-1
    # phase reads real memory so every index map stays the identity
    x_p = jnp.pad(x_p, ((0, d.tb), (0, 0), (0, 0)))
    wxb2 = _pad_gate_mat(params2.w_gifo_x, d.cp)        # [4cp, R]
    wxb2 = _pad2(wxb2, 4 * d.cp, d.rp).T                # [rp, 4cp]
    wr2 = _pad_gate_mat(params2.w_gifo_r, d.cp)
    wr2 = _pad2(wr2, 4 * d.cp, d.rp).T                  # [rp, 4cp]
    wcr2 = _pad2(params2.w_r_m, d.rp, d.cp).T           # [cp, rp]
    if mm_dt is not None:
        wxb2 = wxb2.astype(mm_dt)
        wr2 = wr2.astype(mm_dt)
        wcr2 = wcr2.astype(mm_dt)
    bias2 = jnp.pad(params2.bias.reshape(4, d.C),
                    ((0, 0), (0, d.cp - d.C))).reshape(1, 4 * d.cp)
    peep2 = jnp.stack([params2.peephole_i_c, params2.peephole_f_c,
                       params2.peephole_o_c])
    peep2 = jnp.pad(peep2, ((0, 0), (0, d.cp - d.C)))
    c02 = _pad2(s2.c, d.sp, d.cp)
    r02 = _pad2(s2.r, d.sp, d.rp)
    ops1 = (wxb1, bias1, wr1, wcr1, peep1)
    ops2 = (wxb2, bias2, wr2, wcr2, peep2)
    return x_p, ops1, ops2, c01, r01, c02, r02
