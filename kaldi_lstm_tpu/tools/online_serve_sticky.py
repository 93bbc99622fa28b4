"""Sticky-session streaming serving CLI: sessions bind/release slots
with heterogeneous chunk arrival (NOT lock-step ticks), trailing-
silence endpointing, partial-result finalization — the serving layer
of decode/serve.py driven over a feature table as a reproducible
arrival trace:

    python -m kaldi_lstm_tpu.tools.online_serve_sticky final.nnet \\
        final.mdl lexicon.txt lm.arpa scp:feats.scp ark,t:hyp.txt \\
        --num-slots 16 --chunk-frames 20 --arrival-hazard 0.6 \\
        --class-frame-counts counts.vec --word-symbol-table words.txt

Each utterance becomes a session; sessions are admitted over time (a
geometric arrival hazard per tick makes the trace ragged and
reproducible via --trace-seed) and stream Poisson-sized chunks, so
slots see different rates; excess sessions queue for slots. With
--endpoint-silence-pdfs set, trailing silence finalizes a session
early (the hypothesis then covers the consumed prefix). Hypotheses are
identical to offline decoding of the same audio when endpointing is
off (tests/test_serve.py pins the library; this CLI is pinned by
tests/test_online_serve_sticky.py).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from kaldi_lstm_tpu.decode.online import strip_leading_timeshift
from kaldi_lstm_tpu.decode.scoring import log_priors_from_counts
from kaldi_lstm_tpu.decode.serve import EndpointConfig, StickySessionServer
from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader, TableWriter
from kaldi_lstm_tpu.io.lang import write_text_line
from kaldi_lstm_tpu.models.nnet import Nnet
from kaldi_lstm_tpu.tools.decode_faster import add_graph_args, graph_from_args
from kaldi_lstm_tpu.tools.nnet_forward import read_class_frame_counts
from kaldi_lstm_tpu.utils import LOG


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Sticky-session streaming decoding: slot-bound "
                    "sessions with heterogeneous chunk arrival")
    p.add_argument("nnet")
    add_graph_args(p)
    p.add_argument("feature_rspecifier")
    p.add_argument("trans_wspecifier")
    p.add_argument("--feature-transform", default="")
    p.add_argument("--class-frame-counts", default="")
    p.add_argument("--prior-scale", type=float, default=1.0)
    p.add_argument("--prior-floor", type=float, default=1e-10)
    p.add_argument("--acoustic-scale", type=float, default=0.1)
    p.add_argument("--beam", type=float, default=16.0)
    p.add_argument("--max-active", type=int, default=0)
    p.add_argument("--num-slots", type=int, default=16)
    p.add_argument("--chunk-frames", type=int, default=20)
    p.add_argument("--targets-delay", type=int, default=-1,
                   help="lookahead frames; -1 = take from a leading "
                        "TimeShift component (0 if absent)")
    p.add_argument("--arrival-hazard", type=float, default=1.0,
                   help="per-tick admission probability of the next "
                        "session (1.0 = all arrive immediately)")
    p.add_argument("--mean-chunk", type=float, default=0.0,
                   help="Poisson mean of per-tick frames each session "
                        "delivers (0 = a full --chunk-frames every "
                        "tick)")
    p.add_argument("--trace-seed", type=int, default=0)
    p.add_argument("--top-p", type=int, default=0)
    p.add_argument("--fetch-bf16", default="false")
    p.add_argument("--endpoint-silence-pdfs", default="",
                   help="comma-separated pdf ids; enables trailing-"
                        "silence endpointing")
    p.add_argument("--endpoint-trailing-silence", type=int, default=30)
    p.add_argument("--endpoint-min-speech", type=int, default=3)
    p.add_argument("--endpoint-max-frames", type=int, default=0)
    args = p.parse_args(argv)

    nnet, params = Nnet.read(args.nnet)
    nnet, params, delay = strip_leading_timeshift(nnet, params,
                                                  args.targets_delay)

    transf, transf_params = (Nnet.read(args.feature_transform)
                             if args.feature_transform else (None, None))
    tm, graph = graph_from_args(args)

    log_prior = None
    if args.class_frame_counts:
        log_prior = log_priors_from_counts(
            read_class_frame_counts(args.class_frame_counts),
            args.prior_scale, args.prior_floor)

    endpoint = None
    if args.endpoint_silence_pdfs:
        endpoint = EndpointConfig(
            silence_pdfs=frozenset(
                int(x) for x in args.endpoint_silence_pdfs.split(",")),
            trailing_silence_frames=args.endpoint_trailing_silence,
            min_speech_frames=args.endpoint_min_speech,
            max_utterance_frames=args.endpoint_max_frames)

    import jax.numpy as jnp
    srv = StickySessionServer(
        nnet, params, graph, args.num_slots,
        chunk_frames=args.chunk_frames, transf=transf,
        transf_params=transf_params, log_prior=log_prior,
        acoustic_scale=args.acoustic_scale, beam=args.beam,
        max_active=args.max_active, targets_delay=delay,
        endpoint=endpoint, top_p=args.top_p,
        fetch_dtype=jnp.bfloat16
        if str(args.fetch_bf16).lower() in ("true", "1") else None)

    rng = np.random.RandomState(args.trace_seed)
    reader = iter(SequentialMatrixReader(args.feature_rspecifier))
    cursors: dict = {}
    exhausted = False
    n_endpointed = 0
    total_frames = 0
    ticks = 0
    while True:
        # admit the next session(s) by the arrival hazard
        while not exhausted and rng.rand() < args.arrival_hazard:
            nxt = next(reader, None)
            if nxt is None:
                exhausted = True
                break
            key, mat = nxt
            srv.submit(key, np.zeros((0, mat.shape[1]), np.float32))
            if len(mat) == 0:
                # a zero-length utterance never enters the delivery
                # loop — close it now or its cursor wedges the exit
                # condition forever
                srv.end_stream(key)
                continue
            cursors[key] = [np.asarray(mat, np.float32), 0]
        # live sessions deliver ragged chunks
        for key in list(cursors):
            m, pos = cursors[key]
            if pos >= len(m):
                continue
            n = (len(m) - pos if args.mean_chunk <= 0
                 else min(int(rng.poisson(args.mean_chunk)),
                          len(m) - pos))
            if args.mean_chunk <= 0:
                n = min(args.chunk_frames, n)
            if n > 0:
                srv.submit(key, m[pos:pos + n])
                cursors[key][1] = pos + n
            if cursors[key][1] >= len(m):
                srv.end_stream(key)
                del cursors[key]
        total_frames += srv.tick()
        ticks += 1
        if exhausted and not cursors and \
                all(s is None for s in srv.slots) and not srv.waiting:
            break
        if ticks > 10_000_000:
            print("online_serve_sticky: runaway tick loop",
                  file=sys.stderr)
            return 1

    sym = (graph.words.id2sym if graph.words else {})
    results = sorted(srv.results, key=lambda r: r.sid)
    with TableWriter(args.trans_wspecifier, write_text_line,
                     binary=False) as w:
        for r in results:
            w.write(r.sid, [sym.get(i, str(i)) for i in r.result.words]
                    if args.word_symbol_table else r.result.words)
            n_endpointed += 1 if r.endpointed else 0
    LOG(f"Decoded {len(results)} sessions over {args.num_slots} sticky "
        f"slots in {ticks} ticks (occupancy {srv.occupancy:.2f}, "
        f"{n_endpointed} endpointed, {total_frames} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
