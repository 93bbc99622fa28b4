"""Scale posterior weights — upstream scale-post (bin/scale-post.cc):
the scale is either a global float or a per-utterance float table
(`ark:` of BaseFloat values is uncommon; upstream accepts a vector
table of per-FRAME scales too — both forms are supported here).
Posterior-weighted gradient shaping for sequence-training recipes.

    python -m kaldi_lstm_tpu.tools.scale_post ark:post.ark 0.5 \\
        ark:scaled.ark
    python -m kaldi_lstm_tpu.tools.scale_post ark:post.ark \\
        ark:frame_scales.ark ark:scaled.ark
"""

from __future__ import annotations

import argparse
import sys

from kaldi_lstm_tpu.io.kaldi_io import (
    PosteriorWriter,
    SequentialPosteriorReader,
    read_float_vectors,
)
from kaldi_lstm_tpu.utils import LOG, WARN


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Scale posteriors")
    p.add_argument("post_rspecifier")
    p.add_argument("scale", help="float, or ark: float-vector table of "
                                 "per-frame scales")
    p.add_argument("post_wspecifier")
    args = p.parse_args(argv)

    table = None
    try:
        global_scale = float(args.scale)
    except ValueError:
        global_scale = None
        table = read_float_vectors(args.scale)

    n_done = n_err = 0
    with PosteriorWriter(args.post_wspecifier) as w:
        for key, post in SequentialPosteriorReader(args.post_rspecifier):
            if table is None:
                scales = [global_scale] * len(post)
            else:
                if key not in table:
                    WARN(f"scale-post: no scale for {key}")
                    n_err += 1
                    continue
                scales = table[key]
                if len(scales) != len(post):
                    WARN(f"scale-post: scale length mismatch for {key}")
                    n_err += 1
                    continue
            w.write(key, [[(i, wt * float(s)) for i, wt in frame]
                          for frame, s in zip(post, scales)])
            n_done += 1
    LOG(f"Scaled {n_done} posteriors; {n_err} errors")
    return 0 if n_done > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
