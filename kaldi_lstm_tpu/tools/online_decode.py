"""Online (streaming) word decoding: features are fed chunk-by-chunk
through the stateful net (carried LSTM state, target-delay lookahead)
and an incremental Viterbi decoder — the production-serving counterpart
of the reference's batch decode recipe (README.md:17-30):

    python -m kaldi_lstm_tpu.tools.online_decode final.nnet final.mdl \\
        lexicon.txt lm.arpa scp:feats.scp ark,t:hyp.txt \\
        --class-frame-counts counts.vec --word-symbol-table words.txt \\
        --chunk-frames 20 --targets-delay 5 --print-partials

The streaming simulation feeds --chunk-frames frames at a time; the
final hypothesis per utterance is identical to scoring the whole
utterance then decoding offline (tests/test_online_decode.py pins it).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from kaldi_lstm_tpu.decode.graph import (
    build_decoding_graph,
    build_graph_from_arpa,
)
from kaldi_lstm_tpu.decode.online import OnlineRecognizer
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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Streaming decoding with carried LSTM state over an "
                    "HCLG graph built from model + lexicon + ARPA LM")
    p.add_argument("nnet", help="acoustic net (google or standard format)")
    p.add_argument("model", help="transition model")
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
    p.add_argument("--sil-phone", type=int, default=0)
    p.add_argument("--sil-prob", type=float, default=0.0)
    p.add_argument("--chunk-frames", type=int, default=20,
                   help="frames fed per streaming step")
    p.add_argument("--targets-delay", type=int, default=-1,
                   help="lookahead frames; -1 = take from a leading "
                        "TimeShift component (0 if absent)")
    p.add_argument("--print-partials", action="store_true",
                   help="log the partial hypothesis after every chunk")
    args = p.parse_args(argv)

    nnet, params = Nnet.read(args.nnet)
    transf, transf_params = (Nnet.read(args.feature_transform)
                             if args.feature_transform else (None, None))
    tm = TransitionModel.load(args.model)
    lexicon = read_lexicon(args.lexicon)
    words = (SymbolTable.load(args.word_symbol_table)
             if args.word_symbol_table else None)
    if args.arpa == "none":
        graph = build_decoding_graph(tm, lexicon,
                                     uniform_unigram(sorted(lexicon)),
                                     words=words,
                                     sil_phone=args.sil_phone,
                                     sil_prob=args.sil_prob)
    else:
        graph = build_graph_from_arpa(tm, lexicon, args.arpa,
                                      words=words,
                                      sil_phone=args.sil_phone,
                                      sil_prob=args.sil_prob, log_fn=LOG)
    LOG(f"decoding graph: {graph.num_states} states, "
        f"{graph.num_arcs()} arcs")

    log_prior = None
    if args.class_frame_counts:
        counts = read_class_frame_counts(args.class_frame_counts)
        priors = counts / max(counts.sum(), 1.0)
        log_prior = args.prior_scale * np.log(
            np.maximum(priors, args.prior_floor)).astype(np.float32)

    delay = None if args.targets_delay < 0 else args.targets_delay
    id2sym = graph.words.id2sym
    n, total_frames, no_final = 0, 0, 0
    with TableWriter(args.trans_wspecifier, write_text_line,
                     binary=False) as w:
        for key, feats in SequentialMatrixReader(args.feature_rspecifier):
            rec = OnlineRecognizer(
                nnet, params, graph, transf=transf,
                transf_params=transf_params, log_prior=log_prior,
                acoustic_scale=args.acoustic_scale, beam=args.beam,
                max_active=args.max_active, targets_delay=delay)
            for t0 in range(0, feats.shape[0], args.chunk_frames):
                rec.accept(feats[t0:t0 + args.chunk_frames])
                if args.print_partials:
                    part = rec.partial()
                    LOG(f"{key} @{min(t0 + args.chunk_frames, len(feats))}"
                        f": " + " ".join(id2sym[i] for i in part.words))
            res = rec.finalize()
            w.write(key, [id2sym[i] for i in res.words]
                    if args.word_symbol_table else res.words)
            n += 1
            total_frames += feats.shape[0]
            no_final += 0 if res.reached_final else 1
    LOG(f"Decoded {n} utterances ({total_frames} frames) online"
        + (f"; {no_final} did not reach a final state" if no_final else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
