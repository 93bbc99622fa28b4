"""Forward AM scorer — the `nnet-forward` equivalent (decode call stack,
SURVEY.md §3.2): feeds whole utterances through the net (standard form,
zero initial LSTM state per utterance), optionally applies log and
divides by class priors, and writes scaled log-likelihood matrices for
the decoder. The device machinery lives in decode/scoring.py AmScorer
(shared with the fused score-and-align tool nnet_align.py).

    python -m kaldi_lstm_tpu.tools.nnet_forward [options]
        <model-in> <feature-rspecifier> <feature-wspecifier>
"""

from __future__ import annotations

import argparse
import sys

from kaldi_lstm_tpu.decode.scoring import (
    AmScorer,
    log_priors_from_counts,
    read_class_frame_counts,
)
from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter, SequentialMatrixReader
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.utils import LOG


def add_forward_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--feature-transform", default="",
                   help="Feature transform in Nnet format")
    p.add_argument("--apply-log", default="false",
                   help="Transform NN output by log()")
    p.add_argument("--no-softmax", default="false",
                   help="No softmax on NN output (use when the decoder "
                        "applies it or with log-likelihood output)")
    p.add_argument("--class-frame-counts", default="",
                   help="Vector with frame-counts of pdfs to compute "
                        "log-priors")
    p.add_argument("--prior-scale", type=float, default=1.0,
                   help="Scaling factor applied to the log-priors")
    p.add_argument("--prior-floor", type=float, default=1e-10,
                   help="Floor applied to the priors before log")
    p.add_argument("--length-bucket", type=int, default=128,
                   help="Pad utterance length to multiples of this so XLA "
                        "compiles one program per bucket, not per length")
    p.add_argument("--batch-utts", type=int, default=8,
                   help="Score this many utterances per device batch "
                        "(padded to the longest; 1 = reference behaviour)")


def scorer_from_args(args, model_path: str,
                     **scorer_kwargs) -> AmScorer | None:
    """Build an AmScorer from parsed forward flags (None + stderr
    message on flag conflicts, like upstream's KALDI_ERR). Extra
    kwargs (pipeline/top_p/fetch_dtype, see AmScorer) pass through."""
    apply_log = str(args.apply_log).lower() in ("true", "1", "yes")
    no_softmax = str(args.no_softmax).lower() in ("true", "1", "yes")
    if apply_log and no_softmax:
        # upstream nnet-forward KALDI_ERRs here: log of unnormalized
        # logits is not a log-posterior
        print("nnet-forward: --apply-log=true and --no-softmax=true "
              "cannot be used together", file=sys.stderr)
        return None
    nnet, params = Nnet.read(model_path)
    transf = transf_params = None
    if args.feature_transform:
        transf, transf_params = Nnet.read(args.feature_transform)
    log_prior = None
    if args.class_frame_counts:
        log_prior = log_priors_from_counts(
            read_class_frame_counts(args.class_frame_counts),
            args.prior_scale, args.prior_floor)
    return AmScorer(nnet, params, transf, transf_params, log_prior,
                    apply_log, no_softmax, args.batch_utts,
                    args.length_bucket, **scorer_kwargs)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Perform forward pass through "
                                "Neural Network (acoustic-model scoring)")
    p.add_argument("model_in")
    p.add_argument("feature_rspecifier")
    p.add_argument("feature_wspecifier")
    add_forward_args(p)
    args = p.parse_args(argv)
    from kaldi_lstm_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    scorer = scorer_from_args(args, args.model_in)
    if scorer is None:
        return 1

    num_done = 0
    tot_frames = 0
    with MatrixWriter(args.feature_wspecifier) as writer:
        for key, y in scorer.score_stream(
                SequentialMatrixReader(args.feature_rspecifier)):
            writer.write(key, y)
            num_done += 1
            tot_frames += y.shape[0]

    LOG(f"Done {num_done} files, {tot_frames} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
