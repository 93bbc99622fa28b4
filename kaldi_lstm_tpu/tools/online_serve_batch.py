"""Batched streaming SERVING: N concurrent sessions advance in
lock-step chunks through ONE device dispatch per tick
(decode/online.py OnlineBatchScorer — the google variant's multi-stream
machinery applied to inference), with a native Viterbi session per slot
on the host. The TPU production-serving counterpart of the reference's
batch decode recipe (README.md:17-30):

    python -m kaldi_lstm_tpu.tools.online_serve_batch final.nnet \\
        final.mdl lexicon.txt lm.arpa scp:feats.scp ark,t:hyp.txt \\
        --num-sessions 64 --chunk-frames 20 --top-p 512 \\
        --class-frame-counts counts.vec --word-symbol-table words.txt

Each hypothesis is identical to whole-utterance scoring + offline
decode_faster (state carry is exact across chunks; per-slot reset
between utterances; tests/test_online_serve_batch.py pins it). The
decode-time target delay is applied per utterance with the TimeShift
end-clamp (nnet-time-shift.h:42-51), so delayed nets match their
offline decode too. --top-p prunes the posterior fetch on device
(values+indices only — the serving-link optimization measured in
BENCH_NOTES round 4).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from kaldi_lstm_tpu.decode.graph import (
    build_decoding_graph,
    build_graph_from_arpa,
)
from kaldi_lstm_tpu.decode.online import OnlineBatchScorer, OnlineDecoder
from kaldi_lstm_tpu.io.arpa import uniform_unigram
from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader, TableWriter
from kaldi_lstm_tpu.io.lang import (
    SymbolTable,
    read_lexicon,
    write_text_line,
)
from kaldi_lstm_tpu.io.transition_model import TransitionModel
from kaldi_lstm_tpu.models.nnet import Nnet
from kaldi_lstm_tpu.tools.nnet_forward import read_class_frame_counts
from kaldi_lstm_tpu.utils import LOG


def _shift_feats(feats: np.ndarray, delay: int) -> np.ndarray:
    """Decode-time target delay with the TimeShift end clamp:
    out[t] = in[min(t + delay, T-1)] (nnet-time-shift.h:42-51)."""
    if delay <= 0:
        return feats
    idx = np.minimum(np.arange(len(feats)) + delay, len(feats) - 1)
    return feats[idx]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Batched streaming decoding: N lock-step sessions, "
                    "one device dispatch per chunk tick")
    p.add_argument("nnet")
    p.add_argument("model")
    p.add_argument("lexicon")
    p.add_argument("arpa", help='ARPA LM file, or "none"')
    p.add_argument("feature_rspecifier")
    p.add_argument("trans_wspecifier")
    p.add_argument("--feature-transform", default="")
    p.add_argument("--class-frame-counts", default="")
    p.add_argument("--prior-scale", type=float, default=1.0)
    p.add_argument("--prior-floor", type=float, default=1e-10)
    p.add_argument("--word-symbol-table", default="")
    p.add_argument("--acoustic-scale", type=float, default=0.1)
    p.add_argument("--beam", type=float, default=16.0)
    p.add_argument("--max-active", type=int, default=0)
    p.add_argument("--num-sessions", type=int, default=64)
    p.add_argument("--chunk-frames", type=int, default=20)
    p.add_argument("--targets-delay", type=int, default=-1,
                   help="lookahead frames; -1 = take from a leading "
                        "TimeShift component (0 if absent)")
    p.add_argument("--top-p", type=int, default=0,
                   help="fetch only the top-P log-likelihoods per frame "
                        "from the device (0 = dense)")
    p.add_argument("--fetch-bf16", default="false",
                   help="fetch posterior values as bfloat16")
    p.add_argument("--pipeline", default="false",
                   help="double-buffer device dispatch against the "
                        "posterior fetch (+1 chunk latency, higher "
                        "sustained throughput and tighter tails — "
                        "BENCH_NOTES round 4)")
    args = p.parse_args(argv)

    nnet, params = Nnet.read(args.nnet)
    from kaldi_lstm_tpu.decode.online import strip_leading_timeshift
    nnet, params, delay = strip_leading_timeshift(nnet, params,
                                                  args.targets_delay)

    transf, transf_params = (Nnet.read(args.feature_transform)
                             if args.feature_transform else (None, None))
    tm = TransitionModel.load(args.model)
    lexicon = read_lexicon(args.lexicon)
    words = (SymbolTable.load(args.word_symbol_table)
             if args.word_symbol_table else None)
    if args.arpa == "none":
        graph = build_decoding_graph(tm, lexicon,
                                     uniform_unigram(sorted(lexicon)),
                                     words=words)
    else:
        graph = build_graph_from_arpa(tm, lexicon, args.arpa,
                                      words=words, log_fn=LOG)
    LOG(f"decoding graph: {graph.num_states} states, "
        f"{graph.num_arcs()} arcs")

    log_prior = None
    if args.class_frame_counts:
        counts = read_class_frame_counts(args.class_frame_counts)
        priors = counts / max(counts.sum(), 1.0)
        log_prior = args.prior_scale * np.log(
            np.maximum(priors, args.prior_floor)).astype(np.float32)

    N = args.num_sessions
    import jax.numpy as jnp
    pipelined = str(args.pipeline).lower() in ("true", "1")
    scorer = OnlineBatchScorer(
        nnet, params, N, transf=transf, transf_params=transf_params,
        log_prior=log_prior, top_p=args.top_p,
        fetch_dtype=jnp.bfloat16
        if str(args.fetch_bf16).lower() in ("true", "1") else None,
        pipeline=pipelined)
    feat_dim = nnet.input_dim if transf is None else transf.input_dim
    tc = args.chunk_frames

    reader = iter(SequentialMatrixReader(args.feature_rspecifier))
    writer = TableWriter(args.trans_wspecifier, write_text_line,
                         binary=False)

    # per-slot state: (key, shifted feats, position, decoder) or None
    slots: list = [None] * N
    num_done = 0
    exhausted = False

    def assign(s):
        nonlocal exhausted
        if exhausted:
            return
        nxt = next(reader, None)
        if nxt is None:
            exhausted = True
            return
        key, mat = nxt
        slots[s] = [key, _shift_feats(np.asarray(mat, np.float32),
                                      delay), 0,
                    OnlineDecoder(graph, args.acoustic_scale, args.beam,
                                  args.max_active)]

    for s in range(N):
        assign(s)

    sym = (graph.words.id2sym if graph.words else {})
    chunk = np.zeros((N, tc, feat_dim), np.float32)
    # pipeline mode: score(k) returns tick k-1's block, so tick
    # processing (decoder advance / finalize / slot rebind) lags the
    # dispatch by one; `pending` holds the awaiting ticks' snapshots
    pending: list = []

    def process(meta, ll):
        done_slots = []
        for s, key, real, dec, finished in meta:
            if real:
                dec.advance(np.asarray(ll[s, :real], np.float64))
            if finished:
                res = dec.finalize()
                writer.write(key, [sym.get(w, str(w))
                                   for w in res.words])
                nonlocal_done[0] += 1
                if not res.reached_final:
                    LOG(f"WARNING: {key}: no final state reached")
                done_slots.append(s)
        if done_slots:
            # zero the freed slots' LSTM state before re-binding
            scorer.reset(done_slots)
            for s in done_slots:
                assign(s)

    nonlocal_done = [0]
    while any(slots) or pending:
        if any(slots):
            chunk[:] = 0.0
            meta = []
            for s, slot in enumerate(slots):
                if slot is None:
                    continue
                key, feats, pos, dec = slot
                n = min(tc, len(feats) - pos)
                chunk[s, :n] = feats[pos:pos + n]
                slot[2] = pos + n
                finished = slot[2] >= len(feats)
                meta.append((s, key, n, dec, finished))
                if finished:
                    slots[s] = None  # stops dispatching; rebind at
                    #                  result-processing time
            ll = scorer.score(chunk)
            pending.append(meta)
            if ll is None:
                continue  # pipeline mode's first tick
        else:
            ll = scorer.flush()
        process(pending.pop(0), ll)
    num_done = nonlocal_done[0]
    writer.close()
    LOG(f"Decoded {num_done} utterances over {N} lock-step sessions "
        f"(chunk {tc} frames, delay {delay}, top_p {args.top_p})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
