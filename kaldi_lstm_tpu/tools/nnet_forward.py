"""Forward AM scorer — the `nnet-forward` equivalent (decode call stack,
SURVEY.md §3.2): feeds whole utterances through the net (standard form,
zero initial LSTM state per utterance), optionally applies log and
divides by class priors, and writes scaled log-likelihood matrices for
the decoder.

    python -m kaldi_lstm_tpu.tools.nnet_forward [options]
        <model-in> <feature-rspecifier> <feature-wspecifier>
"""

from __future__ import annotations

import argparse
import io
import sys

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    KaldiInput,
    MatrixWriter,
    SequentialMatrixReader,
    read_vector,
)
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.utils import LOG, WARN


def read_class_frame_counts(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        inp = KaldiInput(io.BufferedReader(io.FileIO(f.fileno(),
                                                     closefd=False)))
        return read_vector(inp)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Perform forward pass through "
                                "Neural Network (acoustic-model scoring)")
    p.add_argument("model_in")
    p.add_argument("feature_rspecifier")
    p.add_argument("feature_wspecifier")
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
    args = p.parse_args(argv)
    from kaldi_lstm_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    apply_log = str(args.apply_log).lower() in ("true", "1", "yes")
    no_softmax = str(args.no_softmax).lower() in ("true", "1", "yes")
    if apply_log and no_softmax:
        # upstream nnet-forward KALDI_ERRs here: log of unnormalized
        # logits is not a log-posterior
        print("nnet-forward: --apply-log=true and --no-softmax=true "
              "cannot be used together", file=sys.stderr)
        return 1

    nnet, params = Nnet.read(args.model_in)
    # decode is pure forward: the fused Pallas inference kernel wins ~1.5x
    # over lax.scan on TPU (training keeps scan; see components._run_scan)
    from kaldi_lstm_tpu.models.components import _LstmBase, _on_tpu
    if _on_tpu():
        for c in nnet.components:
            if isinstance(c, _LstmBase):
                c.impl = "pallas"
    transf = transf_params = None
    if args.feature_transform:
        transf, transf_params = Nnet.read(args.feature_transform)

    log_prior = None
    if args.class_frame_counts:
        counts = read_class_frame_counts(args.class_frame_counts)
        priors = counts / max(counts.sum(), 1.0)
        log_prior = args.prior_scale * np.log(
            np.maximum(priors, args.prior_floor)).astype(np.float32)

    lp_dev = None if log_prior is None else jnp.asarray(log_prior)

    @jax.jit
    def forward(params, transf_params, x):
        if transf is not None:
            x = transf.feedforward(transf_params, x)
        # --apply-log: take the logits and log-softmax on DEVICE, in 2-D
        # rows (3-D softmax is ~20x slower on v5e, see Softmax.apply);
        # host-side np.log of the [N, 16k] posteriors was the slow path
        y, _ = nnet.propagate(params, x,
                              logits=no_softmax or apply_log)
        if apply_log and not no_softmax:
            shape = y.shape
            y = jax.nn.log_softmax(y.reshape(-1, shape[-1]),
                                   axis=-1).reshape(shape)
        if lp_dev is not None and (apply_log or no_softmax):
            y = y - lp_dev
        return y

    num_done = 0
    tot_frames = 0
    bucket = max(args.length_bucket, 1)
    B = max(args.batch_utts, 1)

    def postprocess(y):
        # device path already applied log-softmax / prior subtraction
        if log_prior is not None and not (apply_log or no_softmax):
            WARN("class-frame-counts given but output is not in log "
                 "domain; taking log before prior division")
            y = np.log(np.maximum(y, 1e-20)) - log_prior
        return y

    def flush(group, writer):
        nonlocal num_done, tot_frames
        if not group:
            return
        T = -(-max(f.shape[0] for _, f in group) // bucket) * bucket
        D = group[0][1].shape[1]
        # always shape [B, ...] so the last partial group reuses the
        # compiled program (extra rows are zeros, never written out)
        x = np.zeros((B, T, D), np.float32)
        for i, (_, f) in enumerate(group):
            x[i, :f.shape[0]] = f
            if f.shape[0]:
                x[i, f.shape[0]:] = f[-1]  # repeat last frame into padding
        out = np.asarray(forward(params, transf_params, jnp.asarray(x)))
        for i, (key, f) in enumerate(group):
            y = postprocess(out[i, :f.shape[0]])
            writer.write(key, y)
            num_done += 1
            tot_frames += y.shape[0]

    with MatrixWriter(args.feature_wspecifier) as writer:
        group = []
        for key, feats in SequentialMatrixReader(args.feature_rspecifier):
            group.append((key, feats))
            if len(group) >= B:
                flush(group, writer)
                group = []
        flush(group, writer)

    LOG(f"Done {num_done} files, {tot_frames} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
