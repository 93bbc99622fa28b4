"""Accumulate per-class frame counts from posteriors/alignments — the
`analyze-counts` stage that produces the --class-frame-counts vector
nnet-forward divides priors by (decode call stack, SURVEY.md §3.2).

    python -m kaldi_lstm_tpu.tools.compute_class_counts \\
        --num-classes 8000 ark:post.ark counts.vec
"""

from __future__ import annotations

import argparse
import io
import sys

import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    KaldiOutput,
    RandomAccessPosteriorReader,
    write_vector,
)
from kaldi_lstm_tpu.utils import LOG


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Compute per-pdf frame counts "
                                "from posteriors")
    p.add_argument("post_rspecifier")
    p.add_argument("counts_out")
    p.add_argument("--num-classes", type=int, required=True)
    p.add_argument("--binary", default="false")
    p.add_argument("--counts-offset", type=float, default=0.0,
                   help="Additive smoothing added to every class count")
    args = p.parse_args(argv)

    counts = np.zeros(args.num_classes, np.float64)
    reader = RandomAccessPosteriorReader(args.post_rspecifier,
                                         max_entries=8)
    n_utt = 0
    keys = (list(reader._dense) or list(reader._table) or
            list(reader._scp))
    for key in keys:
        ids, w = reader.value_dense(key, 8)
        np.add.at(counts, ids.reshape(-1), w.reshape(-1))
        n_utt += 1

    counts += args.counts_offset
    with open(args.counts_out, "wb") as f:
        out = KaldiOutput(f, binary=str(args.binary).lower()
                          in ("true", "1", "yes"))
        write_vector(out, counts.astype(np.float32))
    LOG(f"Accumulated counts over {n_utt} utterances, "
        f"{counts.sum():.0f} frames -> {args.counts_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
