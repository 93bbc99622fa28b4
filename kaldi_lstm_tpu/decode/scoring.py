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


class AmScorer:
    """Batched whole-utterance AM scoring (see module docstring)."""

    def __init__(self, nnet: Nnet, params, transf: Optional[Nnet] = None,
                 transf_params=None, log_prior: Optional[np.ndarray] = None,
                 apply_log: bool = False, no_softmax: bool = False,
                 batch_utts: int = 8, length_bucket: int = 128,
                 prefer_pallas: bool = True):
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
        lp_dev = None if log_prior is None else jnp.asarray(log_prior)

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
            return y

        self._forward = forward

    def _postprocess(self, y: np.ndarray) -> np.ndarray:
        # device path already applied log-softmax / prior subtraction
        if self.log_prior is not None and not (self.apply_log
                                               or self.no_softmax):
            WARN("class-frame-counts given but output is not in log "
                 "domain; taking log before prior division")
            y = np.log(np.maximum(y, 1e-20)) - self.log_prior
        return y

    def _flush(self, group) -> Iterator[tuple[str, np.ndarray]]:
        if not group:
            return
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
        out = np.asarray(self._forward(self.params, self.transf_params,
                                       jnp.asarray(x)))
        for i, (key, f) in enumerate(group):
            yield key, self._postprocess(out[i, :f.shape[0]])

    def score_stream(self, reader: Iterable
                     ) -> Iterator[tuple[str, np.ndarray]]:
        """(key, feats) pairs in -> (key, scores [T, K]) pairs out, in
        input order, batching B utterances per device dispatch."""
        group = []
        for key, feats in reader:
            group.append((key, feats))
            if len(group) >= self.B:
                yield from self._flush(group)
                group = []
        yield from self._flush(group)
