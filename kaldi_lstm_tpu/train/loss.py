"""Masked losses over sparse posterior targets + running statistics.

Re-design of the reference's Xent::EvalMasked / Mse::EvalMasked
(google/nnet/nnet-loss.cc:76-164, 374-436). Differences by design:

* Targets stay **sparse**: per frame a fixed-width list of (pdf-id,
  weight) pairs. The reference densifies to a [T*S, 16k] host matrix and
  uploads it per batch (nnet-loss.cc:85-96); on TPU the dense target would
  dominate HBM traffic, so cross-entropy uses log-softmax + gather instead.
* The loss consumes pre-softmax **logits**; jax.grad of the summed loss
  reproduces the reference's diff = (y - t) ⊙ mask exactly (the combined
  softmax+xent derivative).
* Scalars (xent, entropy, correct, frames) are reduced on device; the
  host-side `LossStats` accumulator reproduces the reference's running +
  progressive reporting (`AvgLoss`, `ProgressLoss[h/h]`,
  `FRAME_ACCURACY >> x% <<`, nnet-loss.cc:144-163, 293-307).

Shapes: logits [S, T, K]; tgt_ids/tgt_weights [S, T, Kmax]; mask [S, T].
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import Posterior


class LossAux(NamedTuple):
    """Per-batch statistics (device scalars)."""
    xent: jax.Array      # sum of -t*log(y) over valid frames
    entropy: jax.Array   # sum of -t*log(t) over valid frames
    correct: jax.Array   # frames where argmax(net) == argmax(target)
    frames: jax.Array    # number of valid (unmasked) frames


def posterior_to_sparse(posts: Sequence[Posterior], max_entries: int = 1
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Convert per-stream Posteriors (lists of [(id, w), ...] per frame)
    to fixed-shape [S, T, Kmax] id/weight arrays. T is the max length;
    short streams are padded with weight 0."""
    S = len(posts)
    T = max((len(p) for p in posts), default=0)
    K = max_entries
    ids = np.zeros((S, T, K), np.int32)
    weights = np.zeros((S, T, K), np.float32)
    for s, post in enumerate(posts):
        for t, frame in enumerate(post):
            for k, (pdf, w) in enumerate(frame[:K]):
                ids[s, t, k] = pdf
                weights[s, t, k] = w
    return ids, weights


def masked_xent_loss(logits: jax.Array, tgt_ids: jax.Array,
                     tgt_weights: jax.Array, mask: jax.Array
                     ) -> tuple[jax.Array, LossAux]:
    """Cross-entropy vs sparse targets with a 0/1 frame mask.

    Returns (summed masked xent, stats). jax.grad w.r.t. `logits` of the
    first output equals (softmax(logits) - t) * mask — the reference's
    obj_diff (nnet-loss.cc:103-107).
    """
    # log-softmax in 2-D rows: the 3-D [S, T, K] reduction is ~20x
    # slower on v5e (tools_dev/debug_tail5.py); reshapes are free
    logp = jax.nn.log_softmax(
        logits.reshape(-1, logits.shape[-1]),
        axis=-1).reshape(logits.shape)                        # [S,T,K]
    picked = jnp.take_along_axis(logp, tgt_ids, axis=-1)       # [S,T,Kmax]
    m = mask.astype(logits.dtype)
    xent = -jnp.sum(jnp.sum(tgt_weights * picked, -1) * m)

    # target entropy -t*log(t) (zeros contribute 0, nnet-loss.cc:131-136)
    w = tgt_weights
    ent = -jnp.sum(jnp.sum(jnp.where(w > 0, w * jnp.log(
        jnp.maximum(w, 1e-20)), 0.0), -1) * m)

    # frame accuracy: argmax(net) vs argmax over sparse target entries;
    # weighted by the (possibly fractional) frame mask, upstream
    # CountCorrectFramesWeighted / frames_ += frame_weights.Sum()
    pred = jnp.argmax(logits, axis=-1)                         # [S,T]
    if tgt_ids.shape[-1] == 1:
        # Kmax == 1 (alignment targets): argmax over one candidate is
        # index 0 regardless of its weight — skip the generic gather
        # (it lowers poorly on TPU; see fused_loss_and_stats)
        tgt_best = tgt_ids[..., 0]
    else:
        tw = jnp.where(w > 0, w, -jnp.inf)
        tgt_best = jnp.take_along_axis(
            tgt_ids, jnp.argmax(tw, -1, keepdims=True), -1)[..., 0]
    correct = jnp.sum((pred == tgt_best) * m)
    frames = jnp.sum(m)

    aux = LossAux(xent=jax.lax.stop_gradient(xent), entropy=ent,
                  correct=correct, frames=frames)
    return xent, aux


def masked_mse_loss(y: jax.Array, tgt_ids: jax.Array,
                    tgt_weights: jax.Array, mask: jax.Array
                    ) -> tuple[jax.Array, LossAux]:
    """0.5 * || (y - t) ⊙ mask ||² on the NET OUTPUT as-is (upstream
    Mse::EvalMasked forms diff = net_out - target directly,
    nnet-loss.cc:374-436 — no extra softmax here; trainers pass the
    post-softmax/post-activation output, see make_objective). Sparse
    targets, no densify: ||y - t||² = ||y||² - 2·Σ w·y[id] + Σ w²."""
    picked = jnp.take_along_axis(y, tgt_ids, axis=-1)
    sq = (jnp.sum(y * y, -1)
          - 2.0 * jnp.sum(tgt_weights * picked, -1)
          + jnp.sum(tgt_weights * tgt_weights, -1))
    m = mask.astype(y.dtype)
    loss = 0.5 * jnp.sum(sq * m)
    frames = jnp.sum(m)
    aux = LossAux(xent=jax.lax.stop_gradient(loss),
                  entropy=jnp.zeros((), y.dtype),
                  correct=jnp.array(-1.0, y.dtype), frames=frames)
    return loss, aux


class LossStats:
    """Host-side running/progressive accumulator with the reference's
    report formats (nnet-loss.cc:144-163, 293-307)."""

    # 6 minutes of 100 fps audio (nnet-loss.cc:146); the Mse variant
    # logs every 1e6 samples (nnet-loss.cc:422-436)
    PROGRESS_STEP = 3600 * 100 // 10
    PROGRESS_STEP_MSE = 1_000_000

    def __init__(self, name: str = "Xent"):
        self.name = name
        if name == "Mse":
            self.PROGRESS_STEP = self.PROGRESS_STEP_MSE
        self.loss = 0.0
        self.entropy = 0.0
        self.correct = 0.0   # weighted counts (fractional frame weights)
        self.frames = 0.0
        self.loss_progress = 0.0
        self.entropy_progress = 0.0
        self.correct_progress = 0.0
        self.frames_progress = 0.0
        self.loss_vec: list[float] = []

    def add(self, aux: LossAux, log_fn=None) -> None:
        xent = float(aux.xent)
        ent = float(aux.entropy)
        cor = float(aux.correct)
        frm = float(aux.frames)
        self.loss += xent
        self.entropy += ent
        self.correct += cor
        self.frames += frm
        self.loss_progress += xent
        self.entropy_progress += ent
        self.correct_progress += cor
        self.frames_progress += frm
        if self.frames_progress > self.PROGRESS_STEP:
            avg = ((self.loss_progress - self.entropy_progress)
                   / self.frames_progress)
            if log_fn is not None:
                log_fn(f"ProgressLoss[{self.frames_progress / 100 / 3600:g}h/"
                       f"{self.frames / 100 / 3600:g}h]: {avg:g} "
                       f"({self.name})")
                if self.correct_progress >= 0:  # Mse reports no accuracy
                    log_fn(f"FrameAccuracy[{self.correct_progress / self.frames_progress:g}]")
            self.loss_vec.append(avg)
            self.loss_progress = 0.0
            self.entropy_progress = 0.0
            self.correct_progress = 0
            self.frames_progress = 0

    def avg_loss(self) -> float:
        """AvgLoss as reported: (xent - target entropy) / frames — the
        value nnet1's train_scheduler.sh parses for newbob decisions."""
        return (self.loss - self.entropy) / max(self.frames, 1)

    def report(self) -> str:
        frames = max(self.frames, 1)
        lines = [f"AvgLoss: {(self.loss - self.entropy) / frames:g} "
                 f"({self.name}), [AvgXent: {self.loss / frames:g}, "
                 f"AvgTargetEnt: {self.entropy / frames:g}]"]
        if self.loss_vec:
            lines.append("progress: [" +
                         " ".join(f"{v:g}" for v in self.loss_vec) + " ]")
        if self.correct >= 0:
            lines.append(f"\nFRAME_ACCURACY >> "
                         f"{100.0 * self.correct / frames:g}% <<")
        return "\n".join(lines)
