"""Lattice-based MMI sequence trainer — the upstream nnet1
nnet-train-mmi-sequential binary the reference's standard variant
advertises compatibility with (standard/README.md:6). Consumes
denominator lattices from a first-pass decode (latgen_faster) plus
numerator alignments, rescores the lattice acoustics with the current
model every utterance, and descends the (gamma_den - delta_num)
derivative (train/sequence_lattice.py).

    python -m kaldi_lstm_tpu.tools.nnet_train_mmi_sequential [options] \\
        <feature-rspecifier> <den-lat-rspecifier> <ali-rspecifier> \\
        <transition-model> <model-in> [<model-out>]

(upstream argument order is <model-in> <transition-model> <feats>
<den-lats> <ali> [<model-out>]; this framework keeps its rspecifiers
first, like its other trainers.)

The lattice-FREE alternative (exact phone-loop denominator, no lattice
dumps needed) is tools/nnet_train_mmi.py; this tool exists for the
upstream recipe flow where lattices are decoded once and reused for
several training iterations.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader
from kaldi_lstm_tpu.io.lattice import RandomAccessLatticeReader
from kaldi_lstm_tpu.io.transition_model import TransitionModel
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train.optim import init_momentum, momentum_update
from kaldi_lstm_tpu.train.sequence_lattice import mmi_errors
from kaldi_lstm_tpu.tools.nnet_train_mmi import _bool, _read_alignments
from kaldi_lstm_tpu.utils import LOG, VLOG, WARN, Timer, \
    set_verbose_level


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("feature_rspecifier")
    p.add_argument("den_lat_rspecifier",
                   help="denominator lattices (latgen_faster output)")
    p.add_argument("ali_rspecifier",
                   help="numerator alignments (transition-ids)")
    p.add_argument("transition_model")
    p.add_argument("model_in")
    p.add_argument("model_out", nargs="?", default=None)
    p.add_argument("--binary", default="true")
    p.add_argument("--cross-validate", default="false")
    p.add_argument("--feature-transform", default="")
    p.add_argument("--learn-rate", type=float, default=1e-5)
    p.add_argument("--momentum", type=float, default=0.0)
    p.add_argument("--acoustic-scale", type=float, default=0.1)
    p.add_argument("--lm-scale", type=float, default=1.0)
    p.add_argument("--old-acoustic-scale", type=float, default=0.0,
                   help="add the lattice's original acoustic costs "
                        "with this scale (upstream flag)")
    p.add_argument("--max-frames", type=int, default=6000,
                   help="skip utterances longer than this (upstream "
                        "default)")
    p.add_argument("--class-frame-counts", default="",
                   help="train on log-likelihoods (log-posterior minus "
                        "log-prior) instead of log-posteriors")
    p.add_argument("--length-bucket", type=int, default=128)
    p.add_argument("--verbose", type=int, default=0)


class SequentialRunner:
    """Shared per-utterance machinery of the MMI/MPE sequential tools:
    jitted forward to loglik, jitted diff-injection update step
    (gradient = vjp of the logits at the host-computed error), lattice
    table access, padding/bucketing."""

    def __init__(self, args):
        from kaldi_lstm_tpu.utils import enable_compilation_cache
        enable_compilation_cache()
        set_verbose_level(args.verbose)
        self.args = args
        self.crossvalidate = _bool(args.cross_validate)
        self.tm = TransitionModel.load(args.transition_model)

        self.transf = self.transf_params = None
        if args.feature_transform:
            self.transf, self.transf_params = Nnet.read(
                args.feature_transform)
        self.nnet, self.params = Nnet.read(args.model_in)
        self.log_prior = None
        if args.class_frame_counts:
            from kaldi_lstm_tpu.tools.nnet_forward import \
                read_class_frame_counts
            counts = read_class_frame_counts(args.class_frame_counts)
            priors = counts / max(counts.sum(), 1.0)
            self.log_prior = jnp.asarray(
                np.log(np.maximum(priors, 1e-10)), jnp.float32)

        self.opt_state = init_momentum(self.params)
        self.lr = jnp.float32(args.learn_rate)
        self.alis = _read_alignments(args.ali_rspecifier)
        # offset-indexed lazy reads: the denominator ark of a real
        # corpus is many GB; only the current utterance's lattice
        # is resident (io/lattice.py RandomAccessLatticeReader)
        self.lats = RandomAccessLatticeReader(args.den_lat_rspecifier)
        self.bucket = max(args.length_bucket, 1)

        nnet, transf, transf_params = \
            self.nnet, self.transf, self.transf_params
        log_prior = self.log_prior
        momentum = args.momentum

        def _logits(params, feats):
            x = feats
            if transf is not None:
                x = transf.feedforward(transf_params, x)
            logits, _ = nnet.propagate(params, x,
                                       nnet.init_states(x.shape[0]),
                                       logits=True)
            return logits

        @jax.jit
        def fwd(params, feats):
            ll = jax.nn.log_softmax(_logits(params, feats), axis=-1)
            if log_prior is not None:
                ll = ll - log_prior
            return ll

        @jax.jit
        def apply_diff(params, opt_state, feats, diff, lr):
            # grad of sum(logits * diff) = vjp of the logits at
            # cotangent diff; exact for the log-softmax output because
            # every diff row sums to zero (see sequence_lattice.py)
            grads = jax.grad(
                lambda p: jnp.sum(_logits(p, feats) * diff))(params)
            return momentum_update(params, grads, opt_state, lr,
                                   momentum, 0.0)

        self.fwd = fwd
        self.apply_diff = apply_diff

    def pad(self, feats: np.ndarray) -> jnp.ndarray:
        L = feats.shape[0]
        T = -(-L // self.bucket) * self.bucket
        f = np.zeros((1, T, feats.shape[1]), np.float32)
        f[0, :L] = feats
        if L:
            f[0, L:] = feats[-1]
        return jnp.asarray(f)

    def loglik(self, padded, L: int) -> np.ndarray:
        return np.asarray(self.fwd(self.params, padded)[0, :L])

    def update(self, padded, diff: np.ndarray) -> None:
        d = np.zeros((1, padded.shape[1], diff.shape[1]), np.float32)
        d[0, :diff.shape[0]] = diff
        self.params, self.opt_state = self.apply_diff(
            self.params, self.opt_state, padded, jnp.asarray(d), self.lr)

    def utterances(self):
        """Yields (key, feats, tids, lat) for trainable utterances;
        counts skips like the upstream binaries."""
        self.num_done = self.num_no_ali = self.num_no_lat = 0
        self.num_other_error = 0
        for key, feats in SequentialMatrixReader(
                self.args.feature_rspecifier):
            if key not in self.alis:
                WARN(f"{key}, missing alignment")
                self.num_no_ali += 1
                continue
            if key not in self.lats:
                WARN(f"{key}, missing denominator lattice")
                self.num_no_lat += 1
                continue
            tids = self.alis[key]
            if feats.shape[0] != len(tids) or feats.shape[0] == 0:
                WARN(f"{key}, zero-length or length miss-match between "
                     f"feats and alignment")
                self.num_other_error += 1
                continue
            if feats.shape[0] > self.args.max_frames:
                WARN(f"{key}, too long ({feats.shape[0]} > "
                     f"{self.args.max_frames} frames), skipping")
                self.num_other_error += 1
                continue
            yield key, feats, tids, self.lats[key]
            self.num_done += 1

    def finish(self, mode: str) -> None:
        if not self.crossvalidate:
            self.nnet.write(self.args.model_out, self.params,
                            binary=_bool(self.args.binary))
        LOG(f"Done {self.num_done} files, {self.num_no_ali} with no "
            f"alignment, {self.num_no_lat} with no lattice, "
            f"{self.num_other_error} with other errors.")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="One iteration of lattice-based MMI sequence "
                    "training (nnet-train-mmi-sequential)")
    add_common_args(p)
    p.add_argument("--drop-frames", default="true",
                   help="drop frames whose numerator pdf has zero "
                        "denominator occupancy (upstream default)")
    args = p.parse_args(argv)
    if not _bool(args.cross_validate) and args.model_out is None:
        print("error: <model-out> required unless --cross-validate=true",
              file=sys.stderr)
        return 1
    drop = _bool(args.drop_frames)

    r = SequentialRunner(args)
    timer = Timer()
    total_obj = total_frames = total_dropped = total_correct = 0

    for key, feats, tids, lat in r.utterances():
        padded = r.pad(feats)
        L = feats.shape[0]
        ll = r.loglik(padded, L)
        obj, diff, dropped, correct = mmi_errors(
            lat, r.tm, tids, ll, args.acoustic_scale, args.lm_scale,
            args.old_acoustic_scale, drop)
        if not np.isfinite(obj):
            raise FloatingPointError(
                f"non-finite MMI objective at {key}")
        VLOG(1, f"{key}: MMI obj/frame {obj / L:.5f}, "
                f"frame-acc {100.0 * correct / L:.2f}%, "
                f"dropped {dropped}")
        if not r.crossvalidate:
            r.update(padded, diff)
        total_obj += obj
        total_frames += L
        total_dropped += dropped
        total_correct += correct

    r.finish("MMI")
    t = timer.elapsed()
    cv = r.crossvalidate
    LOG(f"[{'CROSS-VALIDATION' if cv else 'MMI TRAINING'}, "
        f"{t / 60:.2f} min, "
        f"fps{total_frames / max(t, 1e-9):.0f}]")
    LOG(f"Overall MMI-objective/frame: "
        f"{total_obj / max(total_frames, 1):.6f} over {total_frames} "
        f"frames; lattice frame-accuracy "
        f"{100.0 * total_correct / max(total_frames, 1):.2f}%; "
        f"dropped {total_dropped} frames "
        f"({100.0 * total_dropped / max(total_frames, 1):.2f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
