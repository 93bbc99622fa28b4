"""Online (streaming) recognition: chunk-by-chunk AM scoring with
carried LSTM state + incremental Viterbi search.

The reference's decode path is batch-only — whole utterances through the
standard-variant net (state bridging explicitly disabled,
standard/nnet/nnet-lstm-projected.h:228-231) piped into an offline
decoder (README.md:17-30). Online operation is what the google variant's
state-carry machinery exists for in production; this module closes the
loop natively:

* `OnlineDecoder` — incremental version of `decode_faster`: accepts
  log-likelihood chunks as they arrive, maintains the (alpha, active,
  backpointer) search state, and can produce a partial hypothesis at any
  frame. `finalize()` is bit-identical to the offline decoder (same
  per-frame relaxation, pruning, and traceback code).
* `OnlineRecognizer` — full streaming stack: drives the google-format
  net (Transmit + LstmProjectedStreams + Affine + Softmax) with ONE
  stream and functional state carried across chunks — no conversion to
  the standard variant and no whole-utterance latency. The decode-time
  target delay (TimeShift <Shift> k, or the trainer's --targets-delay)
  becomes k frames of lookahead buffering: output frame t is scored on
  input frame t+k, with the reference's end-clamp
  (nnet-time-shift.h:42-51) reproduced at finalize().

Chunked scoring equals whole-utterance scoring exactly because the
carried (c, r) state is the same functional carry the trainer threads
between Tbptt chunks (tested in tests/test_streams.py); hence
online == offline end to end (tests/test_online_decode.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.decode.faster import (
    NEG,
    DecodeResult,
    _frame_step,
    _traceback,
    compile_graph,
)
from kaldi_lstm_tpu.decode.graph import DecodingGraph
from kaldi_lstm_tpu.models.components import (
    BLstmProjectedStreams,
    Softmax,
    TimeShift,
)
from kaldi_lstm_tpu.models.nnet import Nnet


def strip_leading_timeshift(nnet: Nnet, params, targets_delay: int
                            ) -> tuple[Nnet, tuple, int]:
    """Pop a leading TimeShift component for streaming use: its shift
    becomes the default lookahead delay (when targets_delay < 0), since
    streaming applies the delay as per-session buffering instead of a
    component (see _ShiftBuffer). Shared by the serving CLIs."""
    comps, plist = list(nnet.components), list(params)
    delay = targets_delay
    if comps and isinstance(comps[0], TimeShift):
        if delay < 0:
            delay = comps[0].shift
        comps.pop(0)
        plist.pop(0)
    return Nnet(comps), tuple(plist), max(delay, 0)


class OnlineDecoder:
    """Incremental Viterbi beam search. Feed [t, num_pdfs] scaled
    log-likelihood chunks via `advance`; `partial()` gives the current
    best hypothesis (ignoring final weights, like upstream
    GetBestPath(use_final_probs=false)); `finalize()` matches
    decode_faster exactly."""

    def __init__(self, graph: DecodingGraph, acoustic_scale: float = 1.0,
                 beam: float = 16.0, max_active: int = 0):
        self.cg = compile_graph(graph)
        self.acoustic_scale = acoustic_scale
        self.beam = beam
        self.max_active = max_active
        ns = self.cg.ns
        # native persistent session (kltdecode.cc StreamCore) unless
        # forced off — the numpy fallback is the bit-identical
        # cross-check, same as offline decode_faster
        import os
        self._native = None
        if os.environ.get("KLT_DECODE_IMPL", "") != "python":
            from kaldi_lstm_tpu.io.native import NativeStreamSession
            try:
                self._native = NativeStreamSession(
                    ns, self.cg.em_ptr, self.cg.em_dst, self.cg.em_pdf,
                    self.cg.em_w, self.cg.eps_ptr, self.cg.eps_dst,
                    self.cg.eps_w, beam, max_active, self.cg.start)
            except RuntimeError:
                self._native = None
        if self._native is not None:
            self.alpha = None  # fetched from the session on demand
            self.bps = [self._native.bp0]
        else:
            self.alpha = np.full(ns, NEG)
            self.alpha[self.cg.start] = 0.0
            bp0 = np.full(ns, -1, np.int32)
            from kaldi_lstm_tpu.decode.faster import _eps_closure
            _eps_closure(self.cg, self.alpha, bp0,
                         np.asarray([self.cg.start]))
            self.active = np.nonzero(self.alpha > NEG / 2)[0]
            self.bps = [bp0]
        self.num_frames = 0

    def advance(self, loglik: np.ndarray) -> None:
        em = self.acoustic_scale * np.asarray(loglik, np.float64)
        if self._native is not None:
            if len(em) == 0:
                return
            rows = self._native.advance(em)
            self.bps.extend(rows)
            self.num_frames += len(em)
            return
        for row in em:
            bp = np.full(self.cg.ns, -1, np.int32)
            self.alpha, self.active = _frame_step(
                self.cg, self.alpha, self.active, row, self.beam,
                self.max_active, bp, self.num_frames)
            self.bps.append(bp)
            self.num_frames += 1

    def _alpha(self) -> np.ndarray:
        return (self._native.alpha() if self._native is not None
                else self.alpha)

    def partial(self) -> DecodeResult:
        alpha = self._alpha()
        state = int(np.argmax(alpha))
        return DecodeResult(
            words=_traceback(self.cg, self.bps, state, self.num_frames),
            score=float(alpha[state]), reached_final=False)

    def finalize(self) -> DecodeResult:
        alpha = self._alpha()
        total = alpha + self.cg.final
        reached = bool(total.max() > NEG / 2)
        state = int(np.argmax(total if reached else alpha))
        score = float(total[state] if reached else alpha[state])
        words = _traceback(self.cg, self.bps, state, self.num_frames)
        return DecodeResult(words=words, score=score,
                            reached_final=reached)


class _ShiftBuffer:
    """Streams the decode-time target delay: out[t] = in[t + k], end
    frames clamped to the last input (TimeShift semantics,
    nnet-time-shift.h:42-51). `push` returns every shifted frame that
    has become available; `flush` emits the k clamped tail frames."""

    def __init__(self, k: int):
        if k < 0:
            raise ValueError("negative target delay is not supported "
                             "for online decoding")
        self.k = k
        # O(1) state: out[t] = in[t+k] means each push's emittable slice
        # lies entirely within the NEW chunk (invariant: emitted =
        # max(0, seen - k)); only the input count and the last frame
        # (for the clamped tail) need keeping — buffering the whole
        # stream would be unbounded memory on long sessions
        self._seen = 0
        self._last: Optional[np.ndarray] = None

    def push(self, frames: np.ndarray) -> np.ndarray:
        frames = np.asarray(frames, np.float32)
        if len(frames):
            self._last = frames[-1:].copy()
        start = min(max(self.k - self._seen, 0), len(frames))
        self._seen += len(frames)
        return frames[start:]

    def flush(self) -> np.ndarray:
        if self._last is None:
            return np.zeros((0, 0), np.float32)
        tail = min(self.k, self._seen)
        return np.repeat(self._last, tail, axis=0)


class OnlineRecognizer:
    """Streaming recognizer over a stateful (google-variant) net.

    `nnet`/`params` may be either format: a leading TimeShift (standard
    decode nets) is stripped and its <Shift> becomes the lookahead;
    otherwise pass `targets_delay` (the trainer's --targets-delay).
    `log_prior` (length num_pdfs) converts posteriors to scaled
    log-likelihoods exactly as klt-nnet-forward does."""

    def __init__(self, nnet: Nnet, params, graph: DecodingGraph, *,
                 transf: Optional[Nnet] = None, transf_params=None,
                 log_prior: Optional[np.ndarray] = None,
                 acoustic_scale: float = 0.1, beam: float = 16.0,
                 max_active: int = 0,
                 targets_delay: Optional[int] = None):
        comps = list(nnet.components)
        plist = list(params)
        if any(isinstance(c, BLstmProjectedStreams) for c in comps):
            raise ValueError("bidirectional nets cannot stream (the "
                             "backward pass needs the whole utterance)")
        if targets_delay is None:
            targets_delay = 0
            if comps and isinstance(comps[0], TimeShift):
                if comps[0].shift < 0:
                    # a negative shift (past context) cannot stream —
                    # raise like the explicit targets_delay path does
                    raise ValueError(
                        "online decoding: leading TimeShift has "
                        f"negative shift {comps[0].shift}")
                targets_delay = comps[0].shift
                comps.pop(0)
                plist.pop(0)
        # standard-variant components zero their state per call (the
        # reference's decode semantics); streaming needs the carry, so
        # convert LstmProjected -> LstmProjectedStreams (same params)
        self.nnet = Nnet(comps).to_streams()
        self.params = tuple(plist)
        self._softmax = bool(comps) and isinstance(comps[-1], Softmax)
        self.transf = transf
        self.transf_params = transf_params
        self.log_prior = (None if log_prior is None
                          else np.asarray(log_prior, np.float32))
        self.states = self.nnet.init_states(1)
        self.shift = _ShiftBuffer(targets_delay)
        self.decoder = OnlineDecoder(graph, acoustic_scale, beam,
                                     max_active)

        def am_step(p, tp, x, states):
            if self.transf is not None:
                x = self.transf.feedforward(tp, x)
            y, new_states = self.nnet.propagate(p, x, states,
                                                logits=True)
            if self._softmax:
                y = jax.nn.log_softmax(y, axis=-1)
            return y, new_states

        self._am_step = jax.jit(am_step)

    def _score(self, frames: np.ndarray) -> None:
        if frames.shape[0] == 0:
            return
        y, self.states = self._am_step(self.params, self.transf_params,
                                       jnp.asarray(frames,
                                                   jnp.float32)[None],
                                       self.states)
        loglik = np.asarray(y[0], np.float64)
        if self.log_prior is not None:
            loglik = loglik - self.log_prior
        self.decoder.advance(loglik)

    def accept(self, frames: np.ndarray) -> None:
        """Feed a chunk of raw feature frames [t, feat_dim]."""
        self._score(self.shift.push(frames))

    def partial(self) -> DecodeResult:
        return self.decoder.partial()

    def finalize(self) -> DecodeResult:
        self._score(self.shift.flush())
        return self.decoder.finalize()


class OnlineBatchScorer:
    """Batched streaming AM scoring for MANY concurrent sessions — the
    TPU serving shape. One chip runs N carried-state streams in
    lock-step chunks (the trainer's multi-stream batching applied to
    inference, google/README.md:5-16 machinery); the per-session Viterbi
    search stays on the host (decode_faster / OnlineDecoder), consuming
    the batch-fetched log-likelihood rows.

    * `score(feats [N, t, D])` -> [N, t, num_pdfs] log-likelihoods
      (minus log-prior when given): ONE device dispatch + ONE D2H
      transfer per chunk tick.
    * `reset(session_ids)` zeroes individual sessions' LSTM state
      (mask multiply — no recompilation, same mechanism as the
      trainer's per-stream reset).
    * `fetch_dtype` (e.g. jnp.bfloat16) halves the D2H payload — at
      N=512, K=8000, chunk=20 the f32 posterior block is 327 MB/chunk,
      which is the serving bottleneck on a narrow host link.
    * `top_p` > 0 prunes the fetch ON DEVICE: only the top-P
      log-likelihoods per frame (values + int32 pdf indices) cross the
      link — 10-30x smaller — and `score` reconstructs dense rows on
      host with the per-frame floor `min(top values) - floor_margin`
      for unfetched pdfs. Beam search over floored scores is an
      approximation; tests pin decode-result parity at P well under K
      on the synthetic task (tests/test_online_batched.py).

    Pipeline-mode reset ordering (ADVICE r4): with `pipeline=True`,
    `score(x)` dispatches the tick for `x` and returns the PREVIOUS
    tick's block, so one tick is always in flight. `reset(ids)` applies
    to the state feeding the NEXT `score` dispatch; the in-flight
    (buffered) tick was computed with PRE-reset state and is returned
    as such. Callers that must not consume pre-reset scores for a
    session (e.g. when rebinding a slot to a new utterance) should
    call `reset` and discard that session's rows from the one block
    returned by the next `score` — the ordering online_serve_batch
    uses. In non-pipeline mode `reset` takes effect immediately.
    """

    def __init__(self, nnet: Nnet, params, n_sessions: int, *,
                 transf: Optional[Nnet] = None, transf_params=None,
                 log_prior: Optional[np.ndarray] = None,
                 fetch_dtype=None, top_p: int = 0,
                 floor_margin: float = 10.0, pipeline: bool = False):
        comps = list(nnet.components)
        plist = list(params)
        if any(isinstance(c, BLstmProjectedStreams) for c in comps):
            raise ValueError("bidirectional nets cannot stream")
        if comps and isinstance(comps[0], TimeShift):
            raise ValueError("strip the TimeShift and buffer lookahead "
                             "per session (OnlineRecognizer semantics)")
        self.nnet = Nnet(comps).to_streams()
        self.params = tuple(plist)
        self.n = int(n_sessions)
        self._softmax = bool(comps) and isinstance(comps[-1], Softmax)
        self.transf = transf
        self.transf_params = transf_params
        lp = (None if log_prior is None
              else jnp.asarray(log_prior, jnp.float32))
        self.states = self.nnet.init_states(self.n)
        self.top_p = int(top_p)
        self.floor_margin = float(floor_margin)
        self.num_pdfs = self.nnet.output_dim
        softmax = self._softmax
        model = self.nnet
        tr = transf
        P = self.top_p

        def am_step(p, tp, x, states, amask=None):
            if tr is not None:
                x = tr.feedforward(tp, x)
            y, new_states = model.propagate(p, x, states, logits=True,
                                            advance_mask=amask)
            if softmax:
                y = jax.nn.log_softmax(y, axis=-1)
            if lp is not None:
                y = y - lp
            if P > 0:
                vals, idx = jax.lax.top_k(y, P)
                if fetch_dtype is not None:
                    vals = vals.astype(fetch_dtype)
                return (vals, idx.astype(jnp.int32)), new_states
            if fetch_dtype is not None:
                y = y.astype(fetch_dtype)
            return y, new_states

        self._am_step = jax.jit(am_step)
        # heterogeneous-arrival ticks (decode/serve.py): per-slot valid
        # lengths as a [N, t] advance mask — state frozen past each
        # slot's length. Separate jit so the lock-step path keeps its
        # exact program (incl. the Pallas kernels, which the masked scan
        # path bypasses).
        self._am_step_masked = jax.jit(am_step)

        def reset_fn(states, flags):
            return model.reset_states(states, flags)

        self._reset = jax.jit(reset_fn)
        # pipeline mode: double-buffer dispatch against the fetch —
        # score(k) dispatches tick k's compute and returns tick k-1's
        # result (None on the first call; flush() drains the last).
        # +1 chunk of latency buys transfer/compute overlap on
        # transports where they can proceed concurrently.
        self.pipeline = bool(pipeline)
        self._inflight = None

    def _fetch(self, y) -> np.ndarray:
        if self.top_p <= 0:
            return np.asarray(y)
        from kaldi_lstm_tpu.decode.scoring import dense_from_topk
        return dense_from_topk(np.asarray(y[0], np.float32),
                               np.asarray(y[1]), self.num_pdfs,
                               self.floor_margin)

    def score(self, feats: np.ndarray,
              lengths: Optional[np.ndarray] = None
              ) -> Optional[np.ndarray]:
        """[N, t, D] feature chunk tick -> [N, t, num_pdfs] scaled
        log-likelihoods on host (one dispatch; one transfer, two with
        top_p). With top_p, unfetched pdfs read the per-frame floor.
        In pipeline mode the PREVIOUS tick's block is returned (None on
        the first tick).

        `lengths` [N] enables heterogeneous ticks: slot i's state
        advances through only its first lengths[i] frames (frames
        beyond that leave the state untouched; their output rows are
        garbage and must be discarded). This is the sticky-session
        serving shape — slots with starved input feed length 0."""
        assert feats.shape[0] == self.n
        if self.pipeline and isinstance(feats, np.ndarray):
            # jnp.asarray may ZERO-COPY a host numpy buffer (CPU
            # backend), and even jnp.array(copy=True) is not guaranteed
            # to have copied BEFORE returning (the transfer can be
            # staged lazily); with the fetch deferred a caller reusing
            # its chunk buffer for the next tick races the in-flight
            # computation (observed as flaky first-chunk hypothesis
            # flips). A HOST-side numpy copy is synchronous by
            # construction.
            feats = np.array(feats, np.float32, copy=True)
        x = jnp.asarray(feats, jnp.float32)
        if lengths is None:
            y, self.states = self._am_step(
                self.params, self.transf_params, x, self.states)
        else:
            amask = (np.arange(feats.shape[1])[None, :]
                     < np.asarray(lengths)[:, None])
            y, self.states = self._am_step_masked(
                self.params, self.transf_params, x, self.states,
                jnp.asarray(amask, jnp.float32))
        if not self.pipeline:
            return self._fetch(y)
        prev, self._inflight = self._inflight, y
        return None if prev is None else self._fetch(prev)

    def flush(self) -> Optional[np.ndarray]:
        """Pipeline mode: drain the last in-flight tick's result."""
        prev, self._inflight = self._inflight, None
        return None if prev is None else self._fetch(prev)

    def reset(self, session_ids) -> None:
        """Zero the carried state of the given sessions (stream ended /
        new utterance bound to the slot)."""
        flags = np.zeros(self.n, np.int32)
        flags[np.asarray(session_ids, np.int64)] = 1
        self.states = self._reset(self.states, jnp.asarray(flags))
