"""Projected-LSTM (LSTMP, Sak et al. 2014) cell numerics, pure JAX.

Implements exactly the recurrence of the reference's multi-stream cell
(/root/reference/google/nnet/bd-nnet-lstm-projected-streams.h:222-332):

    gifo = x_t @ W_gifo_x^T + bias + r_{t-1} @ W_gifo_r^T      (4C pre-acts)
    i    = sigmoid(i_pre + c_{t-1} * p_i)                       (peephole, diagonal)
    f    = sigmoid(f_pre + c_{t-1} * p_f)
    g    = tanh(g_pre)
    c    = clip(g*i + c_{t-1}*f, +-cell_clip)                   (clip in fwd graph)
    h    = tanh(c)
    o    = sigmoid(o_pre + c * p_o)                             (o-peephole uses clipped c(t), non-recurrent)
    m    = h * o
    r    = m @ W_r_m^T                                          (recurrent projection)

Design notes (TPU-first):

* The input projection ``x @ W_gifo_x^T + bias`` has no sequential
  dependence, so it is hoisted out of the scan as one large [S*T, I] x
  [I, 4C] matmul (the reference does the same hoist at
  bd-nnet-lstm-projected-streams.h:246-259).
* The time recurrence runs under ``jax.lax.scan`` with carry (c, r); the
  hand-written 165-line backward of the reference
  (bd-nnet-lstm-projected-streams.h:334-499, gradient "Version 1": precise
  gradients) is exactly what ``jax.grad`` of this forward produces.
* Cell clipping in the reference is ApplyFloor/ApplyCeiling on the forward
  buffer while the backward pass reads the *clipped* activations and lets
  d_c flow through unchanged — i.e. a straight-through clip. We reproduce
  that with ``stop_gradient`` so gradients match the reference even at the
  clip boundary.
* Weight layouts keep the Kaldi orientation ([4C, I], [4C, R], [R, C]) so
  checkpoints cross-load; XLA folds the transpose into the MXU matmul.
* Gate order along the 4C axis is g, i, f, o (Kaldi serialization order).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LstmParams(NamedTuple):
    """Parameters of one projected-LSTM layer (Kaldi tensor orientation).

    Serialization order matches the reference
    (bd-nnet-lstm-projected-streams.h:133-150): w_gifo_x, w_gifo_r, bias,
    peephole_i_c, peephole_f_c, peephole_o_c, w_r_m.
    """

    w_gifo_x: jax.Array  # [4C, I]
    w_gifo_r: jax.Array  # [4C, R]
    bias: jax.Array      # [4C]
    peephole_i_c: jax.Array  # [C]
    peephole_f_c: jax.Array  # [C]
    peephole_o_c: jax.Array  # [C]
    w_r_m: jax.Array     # [R, C]

    @property
    def cell_dim(self) -> int:
        return self.w_gifo_x.shape[0] // 4

    @property
    def input_dim(self) -> int:
        return self.w_gifo_x.shape[1]

    @property
    def recur_dim(self) -> int:
        return self.w_r_m.shape[0]


class LstmState(NamedTuple):
    """Cross-chunk carried state, threaded functionally between BPTT chunks.

    The reference keeps this inside the component as ``prev_nnet_state_``
    [S, 7C+R] (bd-nnet-lstm-projected-streams.h:76,583); only c and r feed
    the next chunk, so we carry just those.
    """

    c: jax.Array  # [S, C] cell activation (post-clip)
    r: jax.Array  # [S, R] recurrent projection output


def zero_state(nstream: int, cell_dim: int, recur_dim: int,
               dtype=jnp.float32) -> LstmState:
    return LstmState(
        c=jnp.zeros((nstream, cell_dim), dtype),
        r=jnp.zeros((nstream, recur_dim), dtype),
    )


def init_lstm_params(key: jax.Array, input_dim: int, cell_dim: int,
                     recur_dim: int, param_scale: float = 0.02,
                     dtype=jnp.float32) -> LstmParams:
    """Uniform [-scale, +scale] init, as the reference's InitData
    (bd-nnet-lstm-projected-streams.h:55-99)."""
    ks = jax.random.split(key, 7)

    def u(k, shape):
        return jax.random.uniform(k, shape, dtype, -param_scale, param_scale)

    return LstmParams(
        w_gifo_x=u(ks[0], (4 * cell_dim, input_dim)),
        w_gifo_r=u(ks[1], (4 * cell_dim, recur_dim)),
        bias=u(ks[2], (4 * cell_dim,)),
        peephole_i_c=u(ks[3], (cell_dim,)),
        peephole_f_c=u(ks[4], (cell_dim,)),
        peephole_o_c=u(ks[5], (cell_dim,)),
        w_r_m=u(ks[6], (recur_dim, cell_dim)),
    )


def _straight_through_clip(x: jax.Array, limit: float) -> jax.Array:
    """clip(x, -limit, +limit) forward; identity backward.

    Matches the reference, whose backward pass ignores the clip
    (bd-nnet-lstm-projected-streams.h:296-297 forward vs 419-428 backward).
    """
    return x + jax.lax.stop_gradient(jnp.clip(x, -limit, limit) - x)


def lstm_step(params: LstmParams, state: LstmState, xw_t: jax.Array,
              cell_clip: float = 50.0,
              compute_dtype=None) -> tuple[LstmState, jax.Array]:
    """One recurrence step for all streams.

    Args:
      state: (c, r) each [S, ...] from t-1.
      xw_t:  [S, 4C] input-projection pre-activations (x_t @ W^T + bias).
      compute_dtype: optional matmul-input dtype (e.g. bfloat16) for the
        recurrent and projection dots; accumulation and all gate math
        stay float32 — the same contract as the Pallas kernels
        (lstm_pallas._cell_forward: ``wdt = wr_ref.dtype``, dots with
        ``preferred_element_type=f32``).
    Returns: (new_state, r_t [S, R]).
    """
    c_prev, r_prev = state.c, state.r

    if compute_dtype is not None:
        gifo = xw_t + jnp.dot(r_prev.astype(compute_dtype),
                              params.w_gifo_r.astype(compute_dtype).T,
                              preferred_element_type=jnp.float32)
    else:
        gifo = xw_t + jnp.dot(r_prev, params.w_gifo_r.T,
                              preferred_element_type=xw_t.dtype)
    g_pre, i_pre, f_pre, o_pre = jnp.split(gifo, 4, axis=-1)

    i = jax.nn.sigmoid(i_pre + c_prev * params.peephole_i_c)
    f = jax.nn.sigmoid(f_pre + c_prev * params.peephole_f_c)
    g = jnp.tanh(g_pre)
    c = g * i + c_prev * f
    if cell_clip > 0:
        c = _straight_through_clip(c, cell_clip)
    h = jnp.tanh(c)
    o = jax.nn.sigmoid(o_pre + c * params.peephole_o_c)
    m = h * o
    if compute_dtype is not None:
        r = jnp.dot(m.astype(compute_dtype),
                    params.w_r_m.astype(compute_dtype).T,
                    preferred_element_type=jnp.float32)
    else:
        r = jnp.dot(m, params.w_r_m.T, preferred_element_type=xw_t.dtype)
    return LstmState(c=c, r=r), r


def lstm_scan(params: LstmParams, x: jax.Array, state: LstmState,
              cell_clip: float = 50.0,
              compute_dtype=None,
              gate_dropout_mask: jax.Array | None = None,
              time_major: bool = False,
              advance_mask: jax.Array | None = None
              ) -> tuple[jax.Array, LstmState]:
    """Run the projected LSTM over a [S, T, I] chunk.

    Args:
      x: [S, T, I] input features (stream-major), or [T, S, I] with
        ``time_major=True`` — the internal scan layout; passing
        time-major data skips the two [T*S, 4C]-sized transposes.
      state: carried (c, r) from the previous chunk ([S, C], [S, R]);
        reset rows to zero *before* calling for streams starting a new
        utterance (the reference's Nnet::Reset ordering,
        bd-nnet-train-lstm-streams.cc:209).
      compute_dtype: optional matmul-input dtype (e.g. bfloat16) for
        ALL three weight matmuls — input projection, per-step recurrent
        dot, and output projection — with float32 accumulation; the
        carry, gate math, bias add and outputs stay float32. This is
        the SAME contract as the Pallas kernels (a bf16 CPU repro of a
        bf16 TPU run computes matching numerics; pinned by
        tests/test_bf16.py::test_scan_matches_pallas_bf16).
      gate_dropout_mask: optional [S, T, 4C] ([T, S, 4C] if time_major)
        multiplier applied to the input-projection pre-activations before
        the bias — forward-connection dropout per Zaremba et al. 2014,
        the feature the reference stubs out
        (bd-nnet-lstm-projected-streams.h:247-256); here with proper
        inverted-dropout retention scaling.
      advance_mask: optional [S, T] ([T, S] if time_major) 0/1 mask:
        frames with 0 leave the carried state UNCHANGED (the
        heterogeneous-arrival serving shape — per-slot valid lengths in
        one batched dispatch; decode/serve.py). Output rows at masked
        frames are unspecified and must be discarded by the caller.
        This differs from the trainer's frame mask, which only zeroes
        the LOSS while state still advances through padded frames
        (bd-nnet-train-lstm-streams.cc:195-206 semantics).

    Returns: (r_out [S, T, R] — [T, S, R] if time_major — and the final
    state).
    """
    d0, d1, I = x.shape
    if compute_dtype is not None:
        xc = x.astype(compute_dtype)
        wx = params.w_gifo_x.astype(compute_dtype)
    else:
        xc, wx = x, params.w_gifo_x

    # Hoisted input projection: one [S*T, I] x [I, 4C] matmul.
    xw = jnp.dot(xc.reshape(d0 * d1, I), wx.T,
                 preferred_element_type=jnp.float32)
    xw = xw.reshape(d0, d1, 4 * params.cell_dim)
    if gate_dropout_mask is not None:
        xw = xw * gate_dropout_mask
    xw = xw + params.bias

    if advance_mask is None:
        def step(carry, xw_t):
            new_state, r = lstm_step(params, carry, xw_t, cell_clip,
                                     compute_dtype=compute_dtype)
            return new_state, r

        final_state, r_seq = jax.lax.scan(
            step, state, xw if time_major else xw.swapaxes(0, 1))
    else:
        a_tm = (advance_mask if time_major
                else advance_mask.swapaxes(0, 1))          # [T, S]
        a_tm = a_tm.astype(xw.dtype)[..., None]            # [T, S, 1]

        def step(carry, inp):
            xw_t, a_t = inp
            new_state, r = lstm_step(params, carry, xw_t, cell_clip,
                                     compute_dtype=compute_dtype)
            gated = LstmState(
                c=a_t * new_state.c + (1.0 - a_t) * carry.c,
                r=a_t * new_state.r + (1.0 - a_t) * carry.r)
            return gated, r

        final_state, r_seq = jax.lax.scan(
            step, state,
            (xw if time_major else xw.swapaxes(0, 1), a_tm))
    return (r_seq if time_major else r_seq.swapaxes(0, 1)), final_state
