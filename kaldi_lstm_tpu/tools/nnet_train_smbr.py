"""Sequence-discriminative sMBR / MPE trainer — the nnet1
nnet-train-mpe-sequential stage (state-level minimum Bayes risk /
minimum phone error), lattice-free: the expected accuracy is computed
exactly over the dense phone-loop denominator graph instead of decode
lattices (train/sequence.py expected_accuracy — gamma*(acc - E[A])
falls out of autodiff of the jvp identity). The reference's standard
variant advertises compatibility with these nnet1 tools
(standard/README.md); upstream needs lattice dumps + a reference
alignment, here only the alignment (klt-align-mapped output).

    python -m kaldi_lstm_tpu.tools.nnet_train_smbr [options] \\
        <feature-rspecifier> <ali-rspecifier> <final.mdl> \\
        <model-in> [<model-out>]

Start from a frame-xent-trained model (Kaldi recipe convention); use
--criterion mpe for phone-level accuracy, --silence-phones to exclude
silence from the accuracy count.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader
from kaldi_lstm_tpu.io.transition_model import TransitionModel
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train.optim import init_momentum, momentum_update
from kaldi_lstm_tpu.train.sequence import den_graph_for, smbr_objective
from kaldi_lstm_tpu.tools.nnet_train_mmi import _bool, _read_alignments
from kaldi_lstm_tpu.utils import LOG, WARN, Timer, set_verbose_level


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="One iteration of lattice-free sMBR/MPE sequence "
                    "training")
    p.add_argument("feature_rspecifier")
    p.add_argument("ali_rspecifier",
                   help="reference alignments (transition-ids)")
    p.add_argument("transition_model")
    p.add_argument("model_in")
    p.add_argument("model_out", nargs="?", default=None)
    p.add_argument("--binary", default="true")
    p.add_argument("--cross-validate", default="false")
    p.add_argument("--feature-transform", default="")
    p.add_argument("--learn-rate", type=float, default=1e-5)
    p.add_argument("--momentum", type=float, default=0.0)
    p.add_argument("--acoustic-scale", type=float, default=0.1)
    p.add_argument("--criterion", choices=("smbr", "mpe"),
                   default="smbr")
    p.add_argument("--silence-phones", default="",
                   help="colon-separated phone ids excluded from the "
                        "accuracy (upstream convention)")
    p.add_argument("--class-frame-counts", default="",
                   help="train on log-likelihoods (log-posterior minus "
                        "log-prior) instead of log-posteriors")
    p.add_argument("--length-bucket", type=int, default=128)
    p.add_argument("--skip-nonfinite", default="false",
                   help="on a non-finite per-utt expected accuracy, "
                        "revert that utterance's update and continue "
                        "(counted under 'other errors') instead of "
                        "aborting — for weak/noisy AMs where an "
                        "occasional utterance destabilizes the "
                        "sequence criterion")
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

    tm = TransitionModel.load(args.transition_model)
    # structured O(Ns) phone loop / dense DenGraph / per-arc
    # SplitDenGraph (chain-style <Tuples> split-pdf models) — picked by
    # den_graph_for (train/sequence.py)
    graph = den_graph_for(tm)
    sil = None
    if args.silence_phones:
        sil = jnp.asarray([int(x) for x in
                           args.silence_phones.split(":")], jnp.int32)

    transf = transf_params = None
    if args.feature_transform:
        transf, transf_params = Nnet.read(args.feature_transform)

    nnet, params = Nnet.read(args.model_in)
    log_prior = None
    if args.class_frame_counts:
        from kaldi_lstm_tpu.tools.nnet_forward import \
            read_class_frame_counts
        counts = read_class_frame_counts(args.class_frame_counts)
        priors = counts / max(counts.sum(), 1.0)
        log_prior = jnp.asarray(
            np.log(np.maximum(priors, 1e-10)), jnp.float32)

    ac_scale = float(args.acoustic_scale)
    criterion = args.criterion

    @jax.jit
    def step(params, opt_state, feats, refs, mask, lr):
        x = feats
        if transf is not None:
            x = transf.feedforward(transf_params, x)

        def objective(params):
            logits, _ = nnet.propagate(params, x,
                                       nnet.init_states(x.shape[0]),
                                       logits=True)
            loglik = jax.nn.log_softmax(logits, axis=-1)
            if log_prior is not None:
                loglik = loglik - log_prior
            return smbr_objective(graph, loglik, refs, mask, ac_scale,
                                  criterion, sil)

        if crossvalidate:
            obj, ea = objective(params)
            return params, opt_state, obj, ea
        (obj, ea), grads = jax.value_and_grad(
            objective, has_aux=True)(params)
        params, opt_state = momentum_update(params, grads, opt_state,
                                            lr, args.momentum, 0.0)
        return params, opt_state, obj, ea

    alis = _read_alignments(args.ali_rspecifier)
    opt_state = init_momentum(params)
    lr = jnp.float32(args.learn_rate)
    timer = Timer()
    num_done = num_no_ali = num_err = 0
    total_frames = 0
    total_acc = 0.0
    bucket = max(args.length_bucket, 1)

    for key, feats in SequentialMatrixReader(args.feature_rspecifier):
        if key not in alis:
            WARN(f"{key}, missing alignment")
            num_no_ali += 1
            continue
        tids = alis[key]
        L = feats.shape[0]
        if L != len(tids):
            WARN(f"{key}, length miss-match between feats and alignment")
            num_err += 1
            continue
        refs = (tm.transition_ids_to_pdfs(tids) if criterion == "smbr"
                else tm.transition_ids_to_phones(tids))
        T = -(-L // bucket) * bucket
        f = np.zeros((1, T, feats.shape[1]), np.float32)
        f[0, :L] = feats
        if L == 0:
            WARN(f"{key}, zero-length utterance, skip")
            num_err += 1
            continue
        f[0, L:] = feats[-1]
        r = np.zeros((1, T), np.int32)
        r[0, :L] = refs
        mask = np.zeros((1, T), np.float32)
        mask[0, :L] = 1.0

        prev = (params, opt_state)   # functional trees: cheap to keep
        params, opt_state, obj, ea = step(
            params, opt_state, jnp.asarray(f), jnp.asarray(r),
            jnp.asarray(mask), lr)
        ea = float(ea[0])
        if not np.isfinite(ea):
            if _bool(args.skip_nonfinite):
                WARN(f"{key}, non-finite expected accuracy — "
                     "reverting this update and skipping the utterance")
                params, opt_state = prev
                num_err += 1
                continue
            raise FloatingPointError(
                f"non-finite expected accuracy at {key} — bad "
                "alignment or learning rate too high")
        total_acc += ea
        total_frames += L
        num_done += 1

    if not crossvalidate:
        nnet.write(args.model_out, params, binary=_bool(args.binary))

    t = timer.elapsed()
    tag = criterion.upper()
    LOG(f"Done {num_done} files, {num_no_ali} with no alignment, "
        f"{num_err} with other errors. "
        f"[{'CROSS-VALIDATION' if crossvalidate else tag + ' TRAINING'}"
        f", {t / 60:.2f} min, fps{total_frames / max(t, 1e-9):.0f}]")
    LOG(f"Expected{tag}Accuracy/frame: "
        f"{total_acc / max(total_frames, 1):.6f} "
        f"over {total_frames} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
