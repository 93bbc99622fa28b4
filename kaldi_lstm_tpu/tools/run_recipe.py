"""Outer training recipe — the `train_lstm_streams.sh` equivalent
(google/train_lstm_streams.sh:56-89): max_iters iterations of train +
cross-validate with learning-rate decay (lr *= halving_factor once
iter >= start_halving), per-iteration checkpoint files nnet.iterN that
double as resume points.

    python -m kaldi_lstm_tpu.tools.run_recipe \\
        --tr-feats scp:tr/feats.scp --tr-targets ark:tr/post.ark \\
        --cv-feats scp:cv/feats.scp --cv-targets ark:cv/post.ark \\
        --proto nnet.proto --dir exp/lstm
"""

from __future__ import annotations

import argparse
import os
import sys

from kaldi_lstm_tpu.tools import nnet_initialize, train_lstm_streams
from kaldi_lstm_tpu.utils import LOG


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="LSTM multi-stream training "
                                "recipe (outer loop with LR halving)")
    p.add_argument("--tr-feats", required=True)
    p.add_argument("--tr-targets", required=True)
    p.add_argument("--cv-feats", required=True)
    p.add_argument("--cv-targets", required=True)
    p.add_argument("--dir", required=True, help="experiment directory")
    p.add_argument("--proto", default="", help="nnet.proto to initialize "
                   "from (if <dir>/nnet.init is absent)")
    p.add_argument("--feature-transform", default="")
    p.add_argument("--learn-rate", type=float, default=1e-5)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--num-stream", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--targets-delay", type=int, default=5)
    p.add_argument("--dump-interval", type=int, default=10000)
    p.add_argument("--max-iters", type=int, default=15)
    p.add_argument("--start-halving", type=int, default=3)
    p.add_argument("--halving-factor", type=float, default=0.8)
    p.add_argument("--verbose", type=int, default=1)
    args = p.parse_args(argv)

    d = args.dir
    os.makedirs(f"{d}/log", exist_ok=True)
    os.makedirs(f"{d}/nnet", exist_ok=True)

    nnet_init = f"{d}/nnet.init"
    if not os.path.exists(nnet_init):
        if not args.proto:
            print("error: no nnet.init and no --proto given",
                  file=sys.stderr)
            return 1
        LOG("Initializing lstm")
        nnet_initialize.main([args.proto, nnet_init])
    iter0 = f"{d}/nnet/nnet.iter0"
    if not os.path.exists(iter0):
        import shutil
        shutil.copy(nnet_init, iter0)

    learn_rate = args.learn_rate
    common = [
        f"--feature-transform={args.feature_transform}",
        f"--momentum={args.momentum}",
        f"--num-stream={args.num_stream}",
        f"--batch-size={args.batch_size}",
        f"--targets-delay={args.targets_delay}",
        f"--dump-interval={args.dump_interval}",
        f"--verbose={args.verbose}",
    ]

    it = 0
    # resume: skip iterations whose output model already exists
    while it < args.max_iters and \
            os.path.exists(f"{d}/nnet/nnet.iter{it + 1}"):
        if it >= args.start_halving:
            learn_rate *= args.halving_factor
        LOG(f"iteration {it + 1} already done, skipping")
        it += 1

    while it < args.max_iters:
        if it >= args.start_halving:
            learn_rate *= args.halving_factor
        cur = f"{d}/nnet/nnet.iter{it}"
        nxt = f"{d}/nnet/nnet.iter{it + 1}"
        LOG(f"=== iteration {it + 1}/{args.max_iters}, "
            f"learn_rate {learn_rate:g}")
        rc = train_lstm_streams.main(
            [args.tr_feats, args.tr_targets, cur, nxt,
             f"--learn-rate={learn_rate}"] + common)
        if rc != 0:
            return rc
        rc = train_lstm_streams.main(
            [args.cv_feats, args.cv_targets, nxt,
             "--cross-validate=true",
             f"--learn-rate={learn_rate}"] + common)
        if rc != 0:
            return rc
        it += 1

    final = f"{d}/nnet/nnet.iter{args.max_iters}"
    LOG(f"training finished, final model: {final}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
