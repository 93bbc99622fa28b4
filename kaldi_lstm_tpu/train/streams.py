"""Multi-stream truncated-BPTT batch scheduler (host logic).

Reproduces the reference trainer's stream machinery
(google/nnetbin/bd-nnet-train-lstm-streams.cc:143-206):

* S parallel streams, each advancing through one utterance;
* exhausted streams are refilled round-robin from the utterance source at
  the start of each batch (missing targets / length mismatches are warned
  and skipped with counters, :153-167);
* every batch is a fixed-shape [S, Tbptt] chunk with
  - frame_mask: 1 = valid frame, 0 = padding past the utterance end;
  - targets padded by repeating the last frame (its gradient is masked,
    but the LSTM state still advances through padded frames, :193-195);
  - features shifted forward by `targets_delay` within the utterance,
    clamped to the last frame (:198-202);
  - reset_flags: 1 for streams that started a new utterance this batch
    (the trainer zeroes their carried state *before* the chunk, :209);
* iteration ends when every stream is exhausted and the source is dry
  (:176-181).

Pure host logic over numpy — property-test target (SURVEY.md §4). Batch
layout is stream-major [S, T, ...].
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional

import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import Posterior


class StreamBatch(NamedTuple):
    feats: np.ndarray        # [S, T, D] float32 (targets-delay applied)
    tgt_ids: np.ndarray      # [S, T, Kmax] int32
    tgt_weights: np.ndarray  # [S, T, Kmax] float32
    mask: np.ndarray         # [S, T] float32 0/1
    reset_flags: np.ndarray  # [S] int32, 1 = new utterance this batch
    num_new_utts: int        # utterances fed this batch (progress counter)


class PrefetchIterator:
    """Run an iterator on a background thread with a bounded queue so
    host-side batch assembly (ark reads, stream fill) overlaps device
    compute. The reference's single-threaded loop serializes these
    (bd-nnet-train-lstm-streams.cc:143-282)."""

    def __init__(self, iterable, depth: int = 2):
        import queue
        import threading
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err = None

        def worker():
            try:
                for item in iterable:
                    self._q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._sentinel:
                if self._err is not None:
                    raise self._err
                return
            yield item


class StreamScheduler:
    """Iterates fixed-shape multi-stream BPTT batches from an utterance
    source.

    Args:
      utterances: iterator of (key, feats [L, D] float32).
      targets: object with has_key(key) -> bool and value(key) -> Posterior
        (e.g. RandomAccessPosteriorReader).
      num_stream: S.
      batch_size: Tbptt.
      targets_delay: feature shift (future context).
      max_entries: Kmax sparse-target width (1 for ali-to-post targets).
      warn: logging callback for skipped utterances.
      frame_weights: optional dict key -> [L] float32 per-frame gradient
        weights (--frame-weights; upstream registers the flag at
        bd-nnet-train-lstm-streams.cc:46 but never applies it — here the
        weights multiply the frame mask, so padding stays zero and
        fractional weights scale both the gradient and the weighted
        frame/accuracy counts).
    """

    def __init__(self, utterances: Iterator[tuple[str, np.ndarray]],
                 targets, feat_dim: int, num_stream: int = 4,
                 batch_size: int = 20, targets_delay: int = 5,
                 max_entries: int = 1, warn=None, frame_weights=None):
        self.source = iter(utterances)
        self.targets = targets
        self.feat_dim = feat_dim
        self.S = num_stream
        self.T = batch_size
        self.delay = targets_delay
        self.K = max_entries
        self.warn = warn or (lambda msg: None)
        self.frame_weights = frame_weights

        self.keys: list[str] = [""] * self.S
        self.feats: list[Optional[np.ndarray]] = [None] * self.S
        self.tgt_ids: list[Optional[np.ndarray]] = [None] * self.S
        self.tgt_w: list[Optional[np.ndarray]] = [None] * self.S
        self.fw: list[Optional[np.ndarray]] = [None] * self.S
        self.curt = np.zeros(self.S, np.int64)
        self.lent = np.zeros(self.S, np.int64)
        self.source_done = False
        from kaldi_lstm_tpu.io import native as _native
        self._native = _native if _native.get_lib() is not None else None
        # cached raw data pointers for the one-call-per-batch native fill
        # (ctypes marshalling per stream was 90% of scheduler time)
        self._fp = np.zeros(self.S, np.int64)
        self._ip = np.zeros(self.S, np.int64)
        self._wp = np.zeros(self.S, np.int64)

        # counters mirroring num_done / num_no_tgt_mat / num_other_error
        self.num_done = 0
        self.num_no_tgt_mat = 0
        self.num_other_error = 0
        self.total_valid_frames = 0

    # ------------------------------------------------------------------
    def _next_utterance(self):
        """Pull the next usable utterance, skipping bad ones. Targets come
        back dense ([L, K] ids/weights) — converted once per utterance."""
        while True:
            try:
                key, feats = next(self.source)
            except StopIteration:
                self.source_done = True
                return None
            if not self.targets.has_key(key):
                self.warn(f"{key}, missing targets")
                self.num_no_tgt_mat += 1
                continue
            if hasattr(self.targets, "value_dense"):
                ids, w = self.targets.value_dense(key, self.K)
            else:
                post = self.targets.value(key)
                ids = np.zeros((len(post), self.K), np.int32)
                w = np.zeros((len(post), self.K), np.float32)
                for t, frame in enumerate(post):
                    for k, (pdf, weight) in enumerate(frame[:self.K]):
                        ids[t, k] = pdf
                        w[t, k] = weight
            if feats.shape[0] == 0:
                self.warn(f"{key}, zero-length utterance, skip")
                self.num_other_error += 1
                continue
            if feats.shape[0] != ids.shape[0]:
                self.warn(f"{key}, length miss-match between feats and "
                          f"targets, skip")
                self.num_other_error += 1
                continue
            fw = None
            if self.frame_weights is not None:
                if key not in self.frame_weights:
                    self.warn(f"{key}, missing frame weights, skip")
                    self.num_other_error += 1
                    continue
                fw = np.asarray(self.frame_weights[key], np.float32)
                if fw.shape[0] != feats.shape[0]:
                    self.warn(f"{key}, length miss-match between feats "
                              f"and frame weights, skip")
                    self.num_other_error += 1
                    continue
            return (key, np.ascontiguousarray(feats, np.float32),
                    np.ascontiguousarray(ids), np.ascontiguousarray(w), fw)

    def _refill(self) -> np.ndarray:
        """Feed exhausted streams; returns new_utt_flags [S]."""
        flags = np.zeros(self.S, np.int32)
        for s in range(self.S):
            if self.curt[s] < self.lent[s]:
                continue
            nxt = self._next_utterance()
            if nxt is None:
                continue
            (self.keys[s], self.feats[s], self.tgt_ids[s], self.tgt_w[s],
             self.fw[s]) = nxt
            self.curt[s] = 0
            self.lent[s] = self.feats[s].shape[0]
            self._fp[s] = self.feats[s].ctypes.data
            self._ip[s] = self.tgt_ids[s].ctypes.data
            self._wp[s] = self.tgt_w[s].ctypes.data
            flags[s] = 1
        return flags

    # ------------------------------------------------------------------
    def __iter__(self) -> Iterator[StreamBatch]:
        while True:
            flags = self._refill()
            if not np.any(self.curt < self.lent):
                return  # every stream exhausted and source dry

            S, T, D, K = self.S, self.T, self.feat_dim, self.K
            curt_before = self.curt.copy()
            if self._native is not None:
                # one native call fills every stream (and zeroes dry ones)
                feats = np.empty((S, T, D), np.float32)
                ids = np.empty((S, T, K), np.int32)
                weights = np.empty((S, T, K), np.float32)
                mask = np.empty((S, T), np.float32)
                self._native.fill_batch(
                    T, self.delay, self._fp, self._ip, self._wp,
                    self.lent, self.curt, D, K, feats, ids, weights, mask)
            else:
                feats = np.zeros((S, T, D), np.float32)
                ids = np.zeros((S, T, K), np.int32)
                weights = np.zeros((S, T, K), np.float32)
                mask = np.zeros((S, T), np.float32)
                for s in range(S):
                    if self.feats[s] is None:
                        continue  # source dry before this stream ever fed
                    fs = self.feats[s]
                    lent = int(self.lent[s])
                    curt = int(self.curt[s])
                    idx = curt + np.arange(T)
                    row = np.minimum(idx, lent - 1)
                    mask[s] = (idx < lent).astype(np.float32)
                    ids[s] = self.tgt_ids[s][row]
                    weights[s] = self.tgt_w[s][row]
                    feats[s] = fs[np.minimum(idx + self.delay, lent - 1)]
                    self.curt[s] = curt + T

            if self.frame_weights is not None:
                # scale the 0/1 padding mask by per-frame weights (the
                # loss consumes mask multiplicatively, so this weights
                # gradients and the weighted frame/accuracy counts)
                for s in range(S):
                    if self.fw[s] is None:
                        continue
                    idx = int(curt_before[s]) + np.arange(T)
                    valid = idx < int(self.lent[s])
                    if valid.any():
                        mask[s, valid] *= self.fw[s][idx[valid]]

            self.num_done += int(flags.sum())
            self.total_valid_frames += float(mask.sum())
            yield StreamBatch(feats=feats, tgt_ids=ids, tgt_weights=weights,
                              mask=mask, reset_flags=flags,
                              num_new_utts=int(flags.sum()))
