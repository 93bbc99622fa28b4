"""Batched acoustic-model scoring shared by the scoring CLIs.

`AmScorer` is the device half of upstream `nnet-forward` (decode call
stack, SURVEY.md §3.2): whole utterances, zero initial LSTM state,
optional device-side log-softmax and log-prior subtraction, batched
`--batch-utts` at a time with lengths padded to `--length-bucket`
multiples so XLA compiles one program per bucket. tools/nnet_forward.py
writes the matrices; tools/nnet_align.py consumes them directly for
fused score-and-align (no multi-GB loglik ark between the stages).
"""

from __future__ import annotations

import io
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import KaldiInput, read_vector
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.utils import WARN


def read_class_frame_counts(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        inp = KaldiInput(io.BufferedReader(io.FileIO(f.fileno(),
                                                     closefd=False)))
        return read_vector(inp)


def log_priors_from_counts(counts: np.ndarray, prior_scale: float = 1.0,
                           prior_floor: float = 1e-10) -> np.ndarray:
    priors = counts / max(counts.sum(), 1.0)
    return prior_scale * np.log(
        np.maximum(priors, prior_floor)).astype(np.float32)


def dense_from_topk(vals: np.ndarray, idx: np.ndarray, num_pdfs: int,
                    floor_margin: float) -> np.ndarray:
    """Reconstruct dense [..., num_pdfs] log-likelihood rows from a
    device-pruned (top-P values, int32 indices) pair: unfetched pdfs
    read the per-frame floor ``min(fetched values) - floor_margin``.
    Shared by AmScorer and OnlineBatchScorer (one implementation, one
    semantics)."""
    vals = np.asarray(vals, np.float32)
    floor = vals.min(axis=-1, keepdims=True) - floor_margin
    out = np.broadcast_to(floor,
                          vals.shape[:-1] + (num_pdfs,)).copy()
    np.put_along_axis(out, np.asarray(idx).astype(np.int64), vals,
                      axis=-1)
    return out


class AmScorer:
    """Batched whole-utterance AM scoring (see module docstring).

    Fused-eval options (VERDICT r4 item 1 — the score->decode path with
    no multi-GB loglik ark):

    * ``pipeline=True``: dispatch batch k+1 BEFORE fetching batch k, so
      device compute overlaps the host-side fetch + downstream decode
      (one extra batch of latency, zero extra transfers).
    * ``top_p > 0``: prune the fetch ON DEVICE — only the top-P
      log-likelihoods per frame (values + int32 pdf indices) cross the
      link, 10-30x smaller at LVCSR senone counts; dense rows are
      reconstructed host-side with the per-frame floor
      ``min(top values) - floor_margin`` (same mechanism as
      decode/online.py OnlineBatchScorer). Beam search over floored
      scores is an approximation; tests pin transcript/lattice parity
      at P well under K.
    * ``fetch_dtype`` (e.g. jnp.bfloat16) halves the payload of the
      fetched values.
    """

    def __init__(self, nnet: Nnet, params, transf: Optional[Nnet] = None,
                 transf_params=None, log_prior: Optional[np.ndarray] = None,
                 apply_log: bool = False, no_softmax: bool = False,
                 batch_utts: int = 8, length_bucket: int = 128,
                 prefer_pallas: bool = True, pipeline: bool = False,
                 top_p: int = 0, floor_margin: float = 10.0,
                 fetch_dtype=None):
        # decode is pure forward: the fused Pallas inference kernel wins
        # ~1.5x over lax.scan on TPU (training keeps scan; components
        # _run_scan)
        from kaldi_lstm_tpu.models.components import _LstmBase, _on_tpu
        if prefer_pallas and _on_tpu():
            for c in nnet.components:
                if isinstance(c, _LstmBase):
                    c.impl = "pallas"
        self.nnet, self.params = nnet, params
        self.transf, self.transf_params = transf, transf_params
        self.log_prior = log_prior
        self.apply_log, self.no_softmax = apply_log, no_softmax
        self.B = max(batch_utts, 1)
        self.bucket = max(length_bucket, 1)
        self.pipeline = bool(pipeline)
        self.top_p = int(top_p)
        if self.top_p > 0 and not (apply_log or no_softmax):
            # probability-domain output would make both the top-k
            # ranking (prior subtraction happens host-side there) and
            # the min-minus-margin floor wrong
            raise ValueError(
                "top_p pruned fetch requires log-domain output "
                "(apply_log or no_softmax)")
        self.floor_margin = float(floor_margin)
        self.num_pdfs = nnet.output_dim
        lp_dev = None if log_prior is None else jnp.asarray(log_prior)
        P = self.top_p

        @jax.jit
        def forward(params, transf_params, x):
            if transf is not None:
                x = transf.feedforward(transf_params, x)
            # --apply-log: take the logits and log-softmax on DEVICE, in
            # 2-D rows (3-D softmax is ~20x slower on v5e, see
            # Softmax.apply); host-side np.log of the [N, 16k]
            # posteriors was the slow path
            y, _ = nnet.propagate(params, x,
                                  logits=no_softmax or apply_log)
            if apply_log and not no_softmax:
                shape = y.shape
                y = jax.nn.log_softmax(y.reshape(-1, shape[-1]),
                                       axis=-1).reshape(shape)
            if lp_dev is not None and (apply_log or no_softmax):
                y = y - lp_dev
            if P > 0:
                vals, idx = jax.lax.top_k(y, P)
                if fetch_dtype is not None:
                    vals = vals.astype(fetch_dtype)
                return vals, idx.astype(jnp.int32)
            if fetch_dtype is not None:
                y = y.astype(fetch_dtype)
            return y

        self._forward = forward

    def _fetch(self, y) -> np.ndarray:
        """Materialize a device result as a dense [B, T, K] f32 block
        (reconstructing from the pruned (vals, idx) pair with top_p)."""
        if self.top_p <= 0:
            return np.asarray(y, np.float32)
        return dense_from_topk(np.asarray(y[0], np.float32),
                               np.asarray(y[1]), self.num_pdfs,
                               self.floor_margin)

    def _postprocess(self, y: np.ndarray) -> np.ndarray:
        # device path already applied log-softmax / prior subtraction
        if self.log_prior is not None and not (self.apply_log
                                               or self.no_softmax):
            WARN("class-frame-counts given but output is not in log "
                 "domain; taking log before prior division")
            y = np.log(np.maximum(y, 1e-20)) - self.log_prior
        return y

    def _dispatch(self, group):
        """Stage a group and launch the device computation (async)."""
        T = -(-max(f.shape[0] for _, f in group) // self.bucket) \
            * self.bucket
        D = group[0][1].shape[1]
        # always shape [B, ...] so the last partial group reuses the
        # compiled program (extra rows are zeros, never written out)
        x = np.zeros((self.B, T, D), np.float32)
        for i, (_, f) in enumerate(group):
            x[i, :f.shape[0]] = f
            if f.shape[0]:
                x[i, f.shape[0]:] = f[-1]  # repeat last frame as padding
        # jnp.asarray may zero-copy the staging buffer (CPU backend);
        # x is function-local and never reused, so that is safe here
        return self._forward(self.params, self.transf_params,
                             jnp.asarray(x))

    def _emit(self, group, y_dev) -> Iterator[tuple[str, np.ndarray]]:
        out = self._fetch(y_dev)
        for i, (key, f) in enumerate(group):
            yield key, self._postprocess(out[i, :f.shape[0]])

    def score_stream(self, reader: Iterable
                     ) -> Iterator[tuple[str, np.ndarray]]:
        """(key, feats) pairs in -> (key, scores [T, K]) pairs out, in
        input order, batching B utterances per device dispatch. With
        ``pipeline=True`` one batch stays in flight: batch k+1 is
        dispatched before batch k is fetched, overlapping device
        compute with the host fetch and whatever the caller does with
        the yielded rows (e.g. the fused decoder)."""
        inflight = None   # (group, device result)
        group = []
        for key, feats in reader:
            group.append((key, feats))
            if len(group) >= self.B:
                y = self._dispatch(group)
                if self.pipeline:
                    if inflight is not None:
                        yield from self._emit(*inflight)
                    inflight = (group, y)
                else:
                    yield from self._emit(group, y)
                group = []
        if group:
            y = self._dispatch(group)
            if inflight is not None:
                yield from self._emit(*inflight)
            inflight = None
            yield from self._emit(group, y)
        elif inflight is not None:
            yield from self._emit(*inflight)
