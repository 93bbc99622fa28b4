"""Tensor-parallel fused senone-output loss (shard_map over the mesh).

The GSPMD composition of the TP senone layer (parallel/mesh.py) is
correct but materializes each device's [N, K/m] logits shard in HBM —
at 16624 senones that is the dominant HBM stream. This module instead
runs the fused flash-xent kernel (ops/xent_pallas.py) *per model shard*
under shard_map: every device computes its class-shard's online
logsumexp, weighted picked-logit sum and running argmax with logits kept
in VMEM, then three O(N)-sized collectives combine the shards —

* global logsumexp:  ``mx + log(psum(exp(lse_s - mx)))``  (pmax + psum);
* picked logits: each sparse target id lives in exactly one shard → psum;
* frame-accuracy argmax: pmax of the shard maxima, then min-index over
  the shards attaining it (contiguous shards ⇒ this is the FIRST global
  max, FindRowMaxId semantics, cu-matrix.h:428 / nnet-loss.cc:110-121).

Backward recomputes each shard's logit tiles from the residual global
lse, psums dr over 'model' (classes) and dW/db over 'data' (frames).
Loss/stat semantics are identical to train.loss.masked_xent_loss
(nnet-loss.cc:76-164).

Requires the senone count divisible by the model-axis size and the
frame count divisible by the data-axis size (the stream batch already
shards over 'data'); callers fall back to the GSPMD path otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from kaldi_lstm_tpu.ops.xent_pallas import _bwd_call, _fwd_call, \
    _pad_inputs, _tiles
from kaldi_lstm_tpu.train.loss import LossAux


def make_tp_fused_xent(mesh: Mesh, data_axis: str = "data",
                       model_axis: str = "model",
                       interpret: bool | None = None):
    """Build a `(r, w, b, ids, tw, mask) -> (loss, LossAux)` function with
    custom VJP, where r/ids/tw/mask shard over `data_axis` (frames) and
    w/b over `model_axis` (classes). Differentiable in r, w, b."""
    if interpret is None:
        from kaldi_lstm_tpu.models.components import _on_tpu
        interpret = not _on_tpu()

    in_specs = (P(data_axis, None), P(model_axis, None), P(model_axis),
                P(data_axis, None), P(data_axis, None), P(data_axis))

    def _shard_local_ids(ids_l, k_l):
        """Shard-local ids; out-of-shard ids become -1 so they match no
        class-tile lane. (Merely subtracting the offset is wrong: an id
        from a LATER shard can land inside this shard's class padding
        [k_l, kp) and pick up the -1e30 padding logit.)"""
        off = (jax.lax.axis_index(model_axis) * k_l).astype(jnp.int32)
        loc = ids_l - off
        in_shard = (loc >= 0) & (loc < k_l)
        return jnp.where(in_shard, loc, -1), off

    def _local_fwd(r_l, w_l, b_l, ids_l, tw_l, mask_l):
        n = r_l.shape[0]
        k_l = w_l.shape[0]
        ids_loc, off = _shard_local_ids(ids_l, k_l)
        r_p, w_p, b_p, ids_p, tw_p, _, npad, rp, kp = _pad_inputs(
            r_l, w_l, b_l, ids_loc, tw_l, mask_l)
        ft, kt = _tiles(n, k_l)
        lse, picked, amax, aidx = _fwd_call(r_p, w_p, b_p, ids_p, tw_p,
                                            ft=ft, kt=kt,
                                            interpret=interpret)
        lse_l = lse[:n, 0]
        picked_l = picked[:n, 0]
        amax_l = amax[:n, 0]
        aidx_l = aidx[:n, 0] + off.astype(jnp.float32)

        mx = jax.lax.pmax(lse_l, model_axis)
        lse_g = mx + jnp.log(jax.lax.psum(jnp.exp(lse_l - mx), model_axis))
        picked_g = jax.lax.psum(picked_l, model_axis)
        gmax = jax.lax.pmax(amax_l, model_axis)
        cand = jnp.where(amax_l >= gmax, aidx_l, jnp.float32(3e38))
        aidx_g = jax.lax.pmin(cand, model_axis)
        return lse_g, picked_g, aidx_g

    # check_vma=False: pallas_call out_shapes carry no vma annotation
    fwd_sm = shard_map(_local_fwd, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(data_axis),) * 3, check_vma=False)

    def _local_bwd(r_l, w_l, b_l, ids_l, tw_l, mask_l, lse_l, g_loss):
        n, r_dim = r_l.shape
        k_l = w_l.shape[0]
        ids_loc, _ = _shard_local_ids(ids_l, k_l)
        r_p, w_p, b_p, ids_p, tw_p, _, npad, rp, kp = _pad_inputs(
            r_l, w_l, b_l, ids_loc, tw_l, mask_l)
        lse_p = jnp.zeros((npad, 128), jnp.float32).at[:n, 0].set(lse_l)
        scale = jnp.zeros((npad, 128), jnp.float32)
        scale = scale.at[:n, 0].set(g_loss * mask_l.astype(jnp.float32))
        scale = scale.at[:n, 1].set(jnp.sum(tw_l, axis=-1))
        ft, kt = _tiles(n, k_l)
        dr_p, dw_p, db_p = _bwd_call(r_p, w_p, b_p, ids_p, tw_p, lse_p,
                                     scale, ft=ft, kt=kt,
                                     interpret=interpret)
        dr = jax.lax.psum(dr_p[:n, :r_dim], model_axis)   # all classes
        dw = jax.lax.psum(dw_p[:k_l, :r_dim], data_axis)  # all frames
        db = jax.lax.psum(db_p[0, :k_l], data_axis)
        return dr, dw, db

    bwd_sm = shard_map(_local_bwd, mesh=mesh,
                       in_specs=in_specs + (P(data_axis), P()),
                       out_specs=(P(data_axis, None),
                                  P(model_axis, None), P(model_axis)),
                       check_vma=False)

    @jax.custom_vjp
    def tp_fused_xent(r, w, b, ids, tw, mask):
        out, _ = _fwd(r, w, b, ids, tw, mask)
        return out

    def _fwd(r, w, b, ids, tw, mask):
        lse, picked, aidx = fwd_sm(r, w, b, ids, tw, mask)
        aidx = aidx.astype(jnp.int32)
        from kaldi_lstm_tpu.ops.xent_pallas import fused_loss_and_stats
        xent, aux = fused_loss_and_stats(lse, picked, aidx, ids, tw,
                                         mask)
        return (xent, aux), (r, w, b, ids, tw, mask, lse)

    def _bwd(residuals, cotangents):
        r, w, b, ids, tw, mask, lse = residuals
        g_loss, _ = cotangents  # aux is stop_gradiented
        dr, dw, db = bwd_sm(r, w, b, ids, tw, mask, lse,
                            jnp.asarray(g_loss, jnp.float32))
        return dr, dw, db, None, None, None

    tp_fused_xent.defvjp(_fwd, _bwd)
    return tp_fused_xent
