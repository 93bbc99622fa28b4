"""Estimate a CMVN feature transform from data: a 2-component
AddShift(-mean) + Rescale(1/std) net in Kaldi text format — the
feature_transform.nnet.txt of the reference recipe
(google/feature_transform.nnet.txt, train_lstm_streams.sh:45).

    python -m kaldi_lstm_tpu.tools.compute_cmvn_transform \\
        scp:feats.scp feature_transform.nnet.txt
"""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.models.components import AddShift, Rescale
from kaldi_lstm_tpu.utils import LOG


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Compute per-dim CMVN and "
                                "write it as an AddShift+Rescale nnet")
    p.add_argument("feature_rspecifier")
    p.add_argument("transform_out")
    p.add_argument("--binary", default="false")
    p.add_argument("--var-floor", type=float, default=1e-10)
    args = p.parse_args(argv)

    n = 0
    s = s2 = None
    dim = None
    for key, feats in SequentialMatrixReader(args.feature_rspecifier):
        f = np.asarray(feats, np.float64)
        if s is None:
            dim = f.shape[1]
            s = np.zeros(dim)
            s2 = np.zeros(dim)
        s += f.sum(0)
        s2 += (f * f).sum(0)
        n += f.shape[0]
    if n == 0:
        print("error: no features read", file=sys.stderr)
        return 1

    mean = s / n
    var = np.maximum(s2 / n - mean * mean, args.var_floor)
    import jax.numpy as jnp
    nnet = Nnet([AddShift(dim, dim), Rescale(dim, dim)])
    params = ({"shift": jnp.asarray(-mean, jnp.float32)},
              {"scale": jnp.asarray(1.0 / np.sqrt(var), jnp.float32)})
    nnet.write(args.transform_out, params,
               binary=str(args.binary).lower() in ("true", "1", "yes"))
    LOG(f"Computed CMVN over {n} frames, dim {dim} -> "
        f"{args.transform_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
