"""Fused senone-output kernel: AffineTransform + Softmax + masked
cross-entropy in one pass, logits never materialized.

The reference computes the output layer as a [T*S, R] x [R, K] GEMM, a
softmax, a dense-target subtraction and log/sum passes over the full
[T*S, K] posterior matrix (nnet-loss.cc:76-141 + the AffineTransform /
Softmax components). At K = 16624 senones those logits are ~340 MB per
batch and dominate HBM traffic on TPU. This kernel streams class tiles
through VMEM with an online (flash-style) logsumexp / argmax, and the
backward recomputes each tile's logits and accumulates dW / db in
VMEM-resident blocks — nothing of size [N, K] ever reaches HBM.

Layouts: frames N = S*T flattened; W is Kaldi-orientation [K, R]. The
weight matrix and its gradient stay resident in VMEM across the whole
grid (~34 MB at K=16k — the chip has >=120 MB, see BENCH_NOTES.md).

Semantics match train.loss.masked_xent_loss exactly: summed masked xent
over sparse (id, weight) targets, d/dlogits = (softmax*w_tot - t)*mask,
frame accuracy via first-max argmax, target entropy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kaldi_lstm_tpu.train.loss import LossAux

import os

_NEG = -1e30
# tile defaults from the on-chip sweep (tools_dev/bench_xent_tiles.py:
# 512/1024 is 12% faster than 256/512 at N=10240, K=8000)
_FT = int(os.environ.get("KLT_XENT_FRAME_TILE", "512"))   # frame tile
_KT = int(os.environ.get("KLT_XENT_CLASS_TILE", "1024"))  # class tile


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# forward kernel: per-row lse, weighted picked-logit sum, argmax
# ---------------------------------------------------------------------------

def _fwd_kernel(r_ref, w_ref, b_ref, ids_ref, tw_ref,
                lse_ref, picked_ref, amax_ref, aidx_ref,
                m_s, s_s, p_s, av_s, ai_s, *, kt: int, km: int):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, _NEG)
        s_s[:] = jnp.zeros_like(s_s)
        p_s[:] = jnp.zeros_like(p_s)
        av_s[:] = jnp.full_like(av_s, _NEG)
        ai_s[:] = jnp.zeros_like(ai_s)

    wk = w_ref[pl.ds(k * kt, kt), :]                     # [kt, Rp]
    # bf16 weights -> bf16 MXU multiplies with f32 accumulation (the
    # opt-in set_matmul_dtype mode); f32 weights -> f32 path
    z = jax.lax.dot_general(r_ref[:].astype(wk.dtype), wk,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = z + b_ref[0:1, pl.ds(k * kt, kt)]                # [ft, kt]

    tile_max = jnp.max(z, axis=-1, keepdims=True)        # [ft, 1]
    m_old = m_s[:, 0:1]
    m_new = jnp.maximum(m_old, tile_max)
    s_s[:, 0:1] = (s_s[:, 0:1] * jnp.exp(m_old - m_new)
                   + jnp.sum(jnp.exp(z - m_new), axis=-1, keepdims=True))
    m_s[:, 0:1] = m_new

    # weighted picked logits for each sparse target entry in this tile
    ft = z.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ft, kt), 1)
    for j in range(km):
        local = ids_ref[:, j:j + 1] - k * kt
        sel = jnp.where(lane == local, z, 0.0)
        p_s[:, 0:1] += tw_ref[:, j:j + 1] * jnp.sum(sel, axis=-1,
                                                    keepdims=True)

    # running argmax (strictly-greater keeps the FIRST max, FindRowMaxId
    # semantics). Integer-only: jnp.argmax (and any int->float astype)
    # hits a Mosaic legalization hole (arith.sitofp) at small tiles, so
    # the first-max lane index is a masked integer min-reduction and the
    # running index scratch stays i32 end to end.
    in_tile_arg = jnp.min(jnp.where(z >= tile_max, lane, kt),
                          axis=-1, keepdims=True)            # i32 [ft,1]
    upd = tile_max > av_s[:, 0:1]
    ai_s[:, 0:1] = jnp.where(upd, k * kt + in_tile_arg, ai_s[:, 0:1])
    av_s[:, 0:1] = jnp.where(upd, tile_max, av_s[:, 0:1])

    @pl.when(k == nk - 1)
    def _():
        lse_ref[:, 0:1] = m_s[:, 0:1] + jnp.log(s_s[:, 0:1])
        picked_ref[:, 0:1] = p_s[:, 0:1]
        amax_ref[:, 0:1] = av_s[:, 0:1]
        aidx_ref[:, 0:1] = ai_s[:, 0:1]


def _fwd_call(r, w, b, ids, tw, *, ft, kt, interpret):
    npad, rp = r.shape
    kp = w.shape[0]
    km = ids.shape[1]
    grid = (npad // ft, kp // kt)

    def row(s, k):
        return (s, 0)

    outs = [jax.ShapeDtypeStruct((npad, 128), jnp.float32)
            for _ in range(3)] + [jax.ShapeDtypeStruct((npad, 128),
                                                       jnp.int32)]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, kt=kt, km=km),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ft, rp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, rp), lambda s, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda s, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, km), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, km), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((ft, 128), row, memory_space=pltpu.VMEM)
                   for _ in range(4)],
        out_shape=outs,
        scratch_shapes=[pltpu.VMEM((ft, 128), jnp.float32)
                        for _ in range(4)]
        + [pltpu.VMEM((ft, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(r, w, b, ids, tw)


# ---------------------------------------------------------------------------
# backward kernel: dr per frame tile; dW/db accumulated in VMEM
# ---------------------------------------------------------------------------

def _bwd_kernel(r_ref, w_ref, b_ref, ids_ref, tw_ref, lse_ref, scale_ref,
                dr_ref, dw_ref, db_ref, dr_s, *, kt: int, km: int):
    s = pl.program_id(0)
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        dr_s[:] = jnp.zeros_like(dr_s)

    @pl.when((s == 0) & (k == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    wk = w_ref[pl.ds(k * kt, kt), :]
    wdt = wk.dtype
    z = jax.lax.dot_general(r_ref[:].astype(wdt), wk,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = z + b_ref[0:1, pl.ds(k * kt, kt)]
    y = jnp.exp(z - lse_ref[:, 0:1])                       # softmax tile

    # dz = scale * (w_total * y - sum_j w_j * onehot_j); scale folds the
    # upstream loss cotangent and the frame mask (zero on padded frames)
    ft = z.shape[0]
    wtot = scale_ref[:, 1:2]
    dz = y * wtot
    lane = jax.lax.broadcasted_iota(jnp.int32, (ft, kt), 1)
    for j in range(km):
        local = ids_ref[:, j:j + 1] - k * kt
        dz = dz - jnp.where(lane == local, tw_ref[:, j:j + 1], 0.0)
    dz = dz * scale_ref[:, 0:1]

    dzc = dz.astype(wdt)
    dr_s[:] += jnp.dot(dzc, wk, preferred_element_type=jnp.float32)
    dw_ref[pl.ds(k * kt, kt), :] += jax.lax.dot_general(
        dzc, r_ref[:].astype(wdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[0:1, pl.ds(k * kt, kt)] += jnp.sum(dz, axis=0, keepdims=True)

    @pl.when(k == nk - 1)
    def _():
        dr_ref[:] = dr_s[:]


def _bwd_call(r, w, b, ids, tw, lse, scale, *, ft, kt, interpret):
    npad, rp = r.shape
    kp = w.shape[0]
    km = ids.shape[1]
    grid = (npad // ft, kp // kt)

    def row(s, k):
        return (s, 0)

    return pl.pallas_call(
        functools.partial(_bwd_kernel, kt=kt, km=km),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ft, rp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, rp), lambda s, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda s, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, km), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, km), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, 128), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, 128), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ft, rp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, rp), lambda s, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kp), lambda s, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, rp), jnp.float32),
            jax.ShapeDtypeStruct((kp, rp), jnp.float32),
            jax.ShapeDtypeStruct((8, kp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((ft, rp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(r, w, b, ids, tw, lse, scale)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _tiles(n, K):
    """Effective tiles: shrink to the (128-aligned) problem size so small
    batches (per-utterance decode/training) don't pad to full tiles."""
    ft = min(_FT, _round_up(n, 128))
    kt = min(_KT, _round_up(K, 128))
    return ft, kt


def _pad_inputs(r, w, b, ids, tw, mask):
    n, R = r.shape
    K = w.shape[0]
    ft, kt = _tiles(n, K)
    npad = _round_up(n, ft)
    rp = _round_up(R, 128)
    kp = _round_up(K, kt)
    r_p = jnp.pad(r, ((0, npad - n), (0, rp - R)))
    w_p = jnp.pad(w, ((0, kp - K), (0, rp - R)))
    from kaldi_lstm_tpu.models.components import get_matmul_dtype
    mm_dt = get_matmul_dtype()
    if mm_dt is not None:
        # halves the resident W block and doubles the MXU rate of every
        # class-tile GEMM; accumulation and dW stay f32
        w_p = w_p.astype(mm_dt)
    # padded classes get -inf bias so they vanish from lse/argmax
    b_p = jnp.pad(b.reshape(1, K), ((0, 0), (0, kp - K)),
                  constant_values=_NEG)
    ids_p = jnp.pad(ids, ((0, npad - n), (0, 0)))
    tw_p = jnp.pad(tw, ((0, npad - n), (0, 0)))
    mask_p = jnp.pad(mask, ((0, npad - n),))
    return r_p, w_p, b_p, ids_p, tw_p, mask_p, npad, rp, kp


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_affine_xent(r, w, b, ids, tw, mask, interpret=False):
    """loss_sum = masked xent of softmax(r @ w.T + b) vs sparse targets.

    r [N, R] frame activations; w [K, R] (Kaldi orientation), b [K];
    ids/tw [N, Km] sparse targets; mask [N]. Returns (loss, LossAux) —
    identical numbers to masked_xent_loss(logits, ...) without forming
    logits. Differentiable in r, w, b.
    """
    out, _ = _fused_fwd(r, w, b, ids, tw, mask, interpret)
    return out


def fused_loss_and_stats(lse, picked, aidx, ids, tw, mask):
    """(xent, LossAux) from per-frame logsumexp, picked target log-prob
    sums, and net argmax ids — the loss/statistics epilogue shared by
    the single-chip fused kernel and the tensor-parallel variant
    (parallel/xent_tp.py); identical to masked_xent_loss's stats."""
    m = mask.astype(jnp.float32)
    wtot = jnp.sum(tw, axis=-1)
    xent = jnp.sum((wtot * lse - picked) * m)
    ent = -jnp.sum(jnp.sum(jnp.where(tw > 0, tw * jnp.log(
        jnp.maximum(tw, 1e-20)), 0.0), -1) * m)
    if ids.shape[-1] == 1:
        # Km == 1 (alignment targets, the training path): the generic
        # gather below lowers to a 0.08 ms/step kCustom scatter-gather
        # on v5e (trace row fusion.42, BENCH_NOTES round 5) for what is
        # a no-op pick — argmax over one candidate is index 0 whether
        # its weight is positive (tw) or clamped to -inf.
        tgt_best = ids[..., 0]
    else:
        tgt_best = jnp.take_along_axis(
            ids, jnp.argmax(jnp.where(tw > 0, tw, -jnp.inf), -1,
                            keepdims=True), -1)[..., 0]
    correct = jnp.sum((aidx == tgt_best) * m)
    frames = jnp.sum(m)
    aux = LossAux(xent=jax.lax.stop_gradient(xent),
                  entropy=jax.lax.stop_gradient(ent),
                  correct=correct, frames=frames)
    return xent, aux


def _fused_fwd(r, w, b, ids, tw, mask, interpret):
    n = r.shape[0]
    r_p, w_p, b_p, ids_p, tw_p, mask_p, npad, rp, kp = _pad_inputs(
        r, w, b, ids, tw, mask)
    ft, kt = _tiles(r.shape[0], w.shape[0])
    lse, picked, amax, aidx = _fwd_call(r_p, w_p, b_p, ids_p, tw_p,
                                        ft=ft, kt=kt,
                                        interpret=interpret)
    lse = lse[:n, 0]
    picked = picked[:n, 0]
    aidx = aidx[:n, 0].astype(jnp.int32)
    xent, aux = fused_loss_and_stats(lse, picked, aidx, ids, tw, mask)
    residuals = (r, w, b, ids, tw, mask, lse)
    return (xent, aux), residuals


def _fused_bwd(interpret, residuals, cotangents):
    r, w, b, ids, tw, mask, lse = residuals
    g_loss, _ = cotangents  # aux is stop_gradiented
    n = r.shape[0]
    R = r.shape[1]
    K = w.shape[0]
    r_p, w_p, b_p, ids_p, tw_p, mask_p, npad, rp, kp = _pad_inputs(
        r, w, b, ids, tw, mask)
    # padded frame rows get a LARGE lse so the kernel's exp(z - lse)
    # underflows to 0 there — with lse 0 and z = bias a padded row would
    # compute exp(bias), which overflows to inf for bias >= ~88.7 and
    # then inf * (scale = 0) = NaN poisons the dW/db accumulators
    lse_p = jnp.full((npad, 128), 1e30, jnp.float32).at[:n, 0].set(lse)
    scale = jnp.zeros((npad, 128), jnp.float32)
    scale = scale.at[:n, 0].set(g_loss * mask.astype(jnp.float32))
    scale = scale.at[:n, 1].set(jnp.sum(tw, axis=-1))

    ft, kt = _tiles(n, K)
    dr_p, dw_p, db_p = _bwd_call(r_p, w_p, b_p, ids_p, tw_p, lse_p,
                                 scale, ft=ft, kt=kt,
                                 interpret=interpret)
    return (dr_p[:n, :R], dw_p[:K, :R], db_p[0, :K], None, None, None)


fused_affine_xent.defvjp(_fused_fwd, _fused_bwd)


def masked_xent_affine(r, w, b, ids, tw, mask):
    """Auto-selecting entry point: interpreter mode off-TPU (CPU tests),
    compiled kernel on TPU."""
    from kaldi_lstm_tpu.models.components import _on_tpu
    return fused_affine_xent(r, w, b, ids, tw, mask, not _on_tpu())
