"""Fused AM scoring + word decoding — the reference's
`nnet-forward | decode-faster-mapped` / `nnet-forward | latgen-faster`
pipe (/root/reference/README.md:17-30) as ONE process, with no
multi-GB loglik ark (or pipe serialization) between the stages:

    python -m kaldi_lstm_tpu.tools.nnet_decode \\
        final.nnet final.mdl lexicon.txt lm.arpa scp:cv.scp \\
        ark,t:hyp.txt --feature-transform ft.nnet \\
        --class-frame-counts counts.vec --apply-log=true \\
        --acoustic-scale 1.0 --beam 13 --max-active 7000

With --lattice-wspecifier the decoder is the lattice-generating one
(latgen_faster core); hyp output then comes from the lattice best path.

The device half is decode/scoring.py AmScorer — the same scorer
nnet_forward uses, so transcripts/lattices are IDENTICAL to the
two-stage flow by construction — batched `--batch-utts` at a time and
double-buffered (`--pipeline`, default on): batch k+1 computes on
device while batch k is fetched and decoded on host. Two fetch
reducers for transport-bound links (both OFF by default because they
perturb the scores):

* `--fetch-dtype bf16` halves the D2H payload;
* `--top-p P` fetches only the top-P log-likelihoods per frame
  (values + indices, 10-30x smaller at LVCSR senone counts); dense
  rows are reconstructed host-side with a floor. Decode parity at
  P << K is pinned by tests/test_nnet_decode.py.

Scoring semantics (zero initial LSTM state per utterance, optional
log-softmax, prior division) match upstream nnet-forward; see
tools/nnet_forward.py and SURVEY.md §3.2.
"""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp

from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader
from kaldi_lstm_tpu.tools.decode_faster import (
    add_graph_args,
    decode_source,
    graph_from_args,
)
from kaldi_lstm_tpu.tools.latgen_faster import add_latgen_args, latgen_source
from kaldi_lstm_tpu.tools.nnet_forward import (
    add_forward_args,
    scorer_from_args,
)
from kaldi_lstm_tpu.utils import LOG


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Fused acoustic-model scoring + word decoding "
                    "(no intermediate loglik ark)")
    p.add_argument("nnet", help="acoustic model (Nnet format)")
    add_graph_args(p)
    p.add_argument("feature_rspecifier")
    p.add_argument("trans_wspecifier")
    p.add_argument("--lattice-wspecifier", default="",
                   help="generate lattices (latgen core) instead of "
                        "plain Viterbi; transcripts become lattice "
                        "best paths")
    add_latgen_args(p)
    add_forward_args(p)
    p.add_argument("--pipeline", default="true",
                   help="double-buffer device dispatch against host "
                        "fetch+decode")
    p.add_argument("--top-p", type=int, default=0,
                   help="fetch only the top-P log-likelihoods per frame "
                        "(device-side pruning; 0 = dense)")
    p.add_argument("--floor-margin", type=float, default=10.0,
                   help="floor for unfetched pdfs with --top-p: "
                        "min(fetched values) - margin")
    p.add_argument("--fetch-dtype", default="f32",
                   choices=("f32", "bf16"),
                   help="dtype of the fetched log-likelihood values")
    args = p.parse_args(argv)
    from kaldi_lstm_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    tm, graph = graph_from_args(args)
    scorer = scorer_from_args(
        args, args.nnet,
        pipeline=str(args.pipeline).lower() in ("true", "1", "yes"),
        top_p=int(args.top_p), floor_margin=args.floor_margin,
        fetch_dtype=jnp.bfloat16 if args.fetch_dtype == "bf16" else None)
    if scorer is None:
        return 1

    source = scorer.score_stream(
        SequentialMatrixReader(args.feature_rspecifier))
    if args.lattice_wspecifier:
        # in lattice mode the positional trans_wspecifier IS the
        # transcript output; a conflicting --transcript-wspecifier
        # would be silently dead — reject it instead
        if args.transcript_wspecifier and \
                args.transcript_wspecifier != args.trans_wspecifier:
            print("nnet-decode: with --lattice-wspecifier, transcripts "
                  "go to the positional <trans-wspecifier>; do not also "
                  "pass --transcript-wspecifier", file=sys.stderr)
            return 1
        args.transcript_wspecifier = args.trans_wspecifier
        rc = latgen_source(tm, graph, source, args)
    else:
        rc = decode_source(
            tm, graph, source, acoustic_scale=args.acoustic_scale,
            beam=args.beam, max_active=args.max_active,
            trans_wspecifier=args.trans_wspecifier,
            word_strings=bool(args.word_symbol_table),
            num_threads=args.num_threads)
    if rc == 0:
        LOG("fused score->decode done (no intermediate loglik ark)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
