"""Per-utterance trainer — the `nnet-train-perutt` counterpart used by the
standard variant (standard/README.md: epoch-wise BPTT, one utterance per
update, TimeShift in the net provides target delay, element-wise ±50
gradient clipping in Update).

Each utterance is one [1, T] batch with whole-sequence BPTT and zero
initial LSTM state (standard/nnet/nnet-lstm-projected.h:228-231).
Utterance lengths are bucketed to multiples of --length-bucket so XLA
compiles a handful of shapes; padding frames carry zero mask.

    python -m kaldi_lstm_tpu.tools.nnet_train_perutt [options]
        <feature-rspecifier> <targets-rspecifier> <model-in> [<model-out>]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    RandomAccessPosteriorReader,
    SequentialMatrixReader,
)
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import (
    LossStats,
    TrainOptions,
    init_momentum,
    make_train_step,
)
from kaldi_lstm_tpu.utils import LOG, WARN, Timer, set_verbose_level


def _bool(s):
    return str(s).lower() in ("true", "1", "yes")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Perform one iteration of "
                                "per-utterance LSTM training (epoch-wise "
                                "BPTT)")
    p.add_argument("feature_rspecifier")
    p.add_argument("targets_rspecifier")
    p.add_argument("model_in")
    p.add_argument("model_out", nargs="?", default=None)
    p.add_argument("--binary", default="true")
    p.add_argument("--cross-validate", default="false")
    p.add_argument("--feature-transform", default="")
    p.add_argument("--learn-rate", type=float, default=8e-5)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--max-post-entries", type=int, default=1,
                   help="Sparse-target width Kmax per frame (raise for "
                        "soft posteriors)")
    p.add_argument("--l1-penalty", type=float, default=0.0,
                   help="L1 penalty (lassoo) scaled by num-frames")
    p.add_argument("--l2-penalty", type=float, default=0.0,
                   help="L2 penalty (weight decay) scaled by num-frames")
    p.add_argument("--grad-clip", type=float, default=50.0,
                   help="Element-wise gradient clip "
                        "(nnet-lstm-projected.h:480-493)")
    p.add_argument("--length-bucket", type=int, default=128,
                   help="Pad utterance length to multiples of this")
    p.add_argument("--verbose", type=int, default=0)
    args = p.parse_args(argv)
    from kaldi_lstm_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    set_verbose_level(args.verbose)
    crossvalidate = _bool(args.cross_validate)
    if not crossvalidate and args.model_out is None:
        print("error: <model-out> required unless --cross-validate=true",
              file=sys.stderr)
        return 1

    transf = transf_params = None
    if args.feature_transform:
        transf, transf_params = Nnet.read(args.feature_transform)

    nnet, params = Nnet.read(args.model_in)
    opts = TrainOptions(learn_rate=args.learn_rate, momentum=args.momentum,
                        l1_penalty=args.l1_penalty,
                        l2_penalty=args.l2_penalty,
                        grad_clip=args.grad_clip)
    step = make_train_step(nnet, opts, transf, crossvalidate)
    opt_state = init_momentum(params)
    lr = jnp.float32(args.learn_rate)

    targets = RandomAccessPosteriorReader(args.targets_rspecifier,
                                          max_entries=args.max_post_entries)
    stats = LossStats("Xent")
    timer = Timer()
    num_done = num_no_tgt = num_err = 0
    total_frames = 0
    bucket = max(args.length_bucket, 1)

    for key, feats in SequentialMatrixReader(args.feature_rspecifier):
        if not targets.has_key(key):
            WARN(f"{key}, missing targets")
            num_no_tgt += 1
            continue
        K = args.max_post_entries
        ids, w = targets.value_dense(key, K)
        L = feats.shape[0]
        if L != ids.shape[0]:
            WARN(f"{key}, length miss-match between feats and targets")
            num_err += 1
            continue
        if L == 0:
            WARN(f"{key}, zero-length utterance, skip")
            num_err += 1
            continue
        T = -(-L // bucket) * bucket
        f = np.zeros((1, T, feats.shape[1]), np.float32)
        f[0, :L] = feats
        f[0, L:] = feats[-1]
        bi = np.zeros((1, T, K), np.int32)
        bi[0, :L] = ids
        bw = np.zeros((1, T, K), np.float32)
        bw[0, :L] = w
        mask = np.zeros((1, T), np.float32)
        mask[0, :L] = 1.0

        params, opt_state, _, aux = step(
            params, opt_state, nnet.init_states(1), transf_params,
            jnp.asarray(f), jnp.asarray(bi), jnp.asarray(bw),
            jnp.asarray(mask), jnp.ones((1,), jnp.int32), lr)
        stats.add(aux)
        total_frames += int(aux.frames)
        num_done += 1

    if not crossvalidate:
        nnet.write(args.model_out, params, binary=_bool(args.binary))

    t = timer.elapsed()
    LOG(f"Done {num_done} files, {num_no_tgt} with no tgt_mats, "
        f"{num_err} with other errors. "
        f"[{'CROSS-VALIDATION' if crossvalidate else 'TRAINING'}, "
        f"{t / 60:.2f} min, fps{total_frames / max(t, 1e-9):.0f}]")
    LOG(stats.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
