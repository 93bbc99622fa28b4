"""Initialize an Nnet from an <NnetProto> topology description — the
`nnet-initialize` equivalent (used by train_lstm_streams.sh:50; call
stack in SURVEY.md §3.3).

    python -m kaldi_lstm_tpu.tools.nnet_initialize [--binary=true]
        [--seed=N] nnet.proto nnet.init
"""

from __future__ import annotations

import argparse
import sys

import jax

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.utils import LOG


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Initialize Neural Network "
                                "parameters according to a prototype")
    p.add_argument("nnet_proto")
    p.add_argument("nnet_out")
    p.add_argument("--binary", default="true")
    p.add_argument("--seed", type=int, default=777)
    args = p.parse_args(argv)

    with open(args.nnet_proto) as f:
        proto = f.read()
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(args.seed))
    nnet.write(args.nnet_out, params,
               binary=str(args.binary).lower() in ("true", "1", "yes"))
    LOG(f"Written initialized model to {args.nnet_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
