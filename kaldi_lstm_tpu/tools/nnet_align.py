"""Fused score-and-align: nnet-forward + align-mapped in ONE pass.

The reference realignment flow pipes the AM scorer into the aligner
(upstream steps/nnet/align.sh: `nnet-forward | align-compiled-mapped`),
which at flagship dims materializes a huge loglik ark between them
(5.5 GB for 400 utterances at 7998 senones in the flagship experiment
— 14 min of the pipeline). This tool scores batched on the device
(decode/scoring.py AmScorer) and aligns each utterance as its scores
arrive: same alignments, no intermediate ark.

    python -m kaldi_lstm_tpu.tools.nnet_align [forward options] \\
        <nnet> <transition-model> <lexicon> <feature-rspecifier> \\
        <transcripts> <ali-wspecifier> \\
        --class-frame-counts counts.vec --acoustic-scale 1.0
"""

from __future__ import annotations

import argparse
import sys

from kaldi_lstm_tpu.io.kaldi_io import (
    SequentialMatrixReader,
    TableWriter,
    write_int_vector,
)
from kaldi_lstm_tpu.io.lang import (
    SymbolTable,
    read_lexicon,
    read_text_table,
)
from kaldi_lstm_tpu.io.transition_model import TransitionModel
from kaldi_lstm_tpu.tools.align_mapped import align_stream
from kaldi_lstm_tpu.tools.nnet_forward import (
    add_forward_args,
    scorer_from_args,
)
from kaldi_lstm_tpu.utils import LOG


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Score features with the net and Viterbi-align "
                    "against known transcripts in one pass")
    p.add_argument("nnet")
    p.add_argument("model", help="transition model (final.mdl)")
    p.add_argument("lexicon")
    p.add_argument("feature_rspecifier")
    p.add_argument("transcripts", help="text file: key word word ...")
    p.add_argument("ali_wspecifier")
    add_forward_args(p)
    p.add_argument("--acoustic-scale", type=float, default=1.0)
    p.add_argument("--beam", type=float, default=200.0)
    p.add_argument("--max-active", type=int, default=0)
    p.add_argument("--sil-phone", type=int, default=0)
    p.add_argument("--sil-prob", type=float, default=0.0)
    p.add_argument("--word-symbol-table", default="")
    p.add_argument("--transcripts-are-ids", action="store_true",
                   help="transcript tokens are word ids from "
                        "--word-symbol-table")
    args = p.parse_args(argv)
    if args.transcripts_are_ids and not args.word_symbol_table:
        print("nnet_align: --transcripts-are-ids requires "
              "--word-symbol-table", file=sys.stderr)
        return 1
    from kaldi_lstm_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    if str(args.apply_log).lower() not in ("true", "1", "yes") and \
            str(args.no_softmax).lower() not in ("true", "1", "yes"):
        # scoring for alignment needs log-likelihood-ish output; default
        # to the standard prior-divided log-posterior configuration
        args.apply_log = "true"

    scorer = scorer_from_args(args, args.nnet)
    if scorer is None:
        return 1
    tm = TransitionModel.load(args.model)
    lexicon = read_lexicon(args.lexicon)
    words = (SymbolTable.load(args.word_symbol_table)
             if args.word_symbol_table else None)
    texts = read_text_table(args.transcripts)

    # skip transcript-less utterances BEFORE scoring: a discarded
    # device forward at flagship dims is the expensive part
    no_text = 0

    def with_transcripts(reader):
        nonlocal no_text
        for key, feats in reader:
            if key not in texts:
                LOG(f"WARNING: {key}: no transcript, skipping")
                no_text += 1
                continue
            yield key, feats

    with TableWriter(args.ali_wspecifier, write_int_vector) as w:
        n, _, failed = align_stream(
            scorer.score_stream(with_transcripts(
                SequentialMatrixReader(args.feature_rspecifier))),
            texts, tm, lexicon, words, args, w)
    LOG(f"Scored+aligned {n} utterances"
        + (f"; {no_text} without transcript" if no_text else "")
        + (f"; {failed} failed" if failed else ""))
    return 0 if n > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
