"""Per-frame LSTM activation/derivative dump — the reference's
``int DEBUG`` blocks as a CLI.

The reference compiles per-frame tensor prints into the component
(bd-nnet-lstm-projected-streams.h:314-324 forward, 443-453 backward,
489-498 gradients) behind an ``int DEBUG`` switch. Here the same
tensors (YG..YR activations, DG..DR derivatives, per-weight gradient
sums) come from the host-side reference implementation
(ops/lstm_grad_variants.py) on one real minibatch, with the upstream
derivative taken from the actual network loss via autodiff — so the
dump shows exactly what training's backward sees. Frames print as
moment summaries (``--print-frames`` full tensors) and every tensor is
saved to ``<dump-dir>/layer<i>.<token>.npz``.

``--variant`` selects the reference's gradient version (1 = precise
live version, 2 = Graves, 3 = Gers truncation, …streams.h:388-405).

Usage:
  python -m kaldi_lstm_tpu.tools.nnet_debug_dump <model> \
      <feature-rspecifier> <dump-dir> [--targets <posterior-rspec>] ...
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    RandomAccessPosteriorReader,
    SequentialMatrixReader,
)
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.models.components import (
    _LstmBase,
    moment_statistics,
)
from kaldi_lstm_tpu.ops.lstm_grad_variants import (
    backward_variant,
    forward_full,
)
from kaldi_lstm_tpu.utils import LOG


def _load_chunk(feats_rspec, targets_rspec, num_stream, batch_size,
                feat_dim):
    """First minibatch: [S, T, I] features + [S, T] target ids (zeros
    when no targets are given)."""
    feats, ids = [], []
    targets = (RandomAccessPosteriorReader(targets_rspec)
               if targets_rspec else None)
    for key, mat in SequentialMatrixReader(feats_rspec):
        if mat.shape[1] != feat_dim:
            continue
        post = None
        if targets is not None:
            if not targets.has_key(key):
                continue
            post = targets.value(key)
        feats.append(mat)
        if post is not None:
            ids.append([max(fr, key=lambda e: e[1])[0] if fr else 0
                        for fr in post])
        if len(feats) >= num_stream:
            break
    if not feats:
        raise RuntimeError("no usable utterances for the debug dump")
    T = min(batch_size, min(m.shape[0] for m in feats))
    if ids:
        T = min(T, min(len(i) for i in ids))
    x = np.stack([m[:T] for m in feats]).astype(np.float32)
    y = (np.stack([np.asarray(i[:T], np.int32) for i in ids])
         if ids else np.zeros(x.shape[:2], np.int32))
    return x, y


def debug_dump(nnet: Nnet, params, x, ids, dump_dir, variant=1,
               print_frames=3, have_targets=False, out=sys.stderr):
    """Dump per-frame tensors for every LSTM layer of `nnet` on the
    chunk x [S, T, I] / ids [S, T]."""
    os.makedirs(dump_dir, exist_ok=True)
    S = x.shape[0]

    # per-layer inputs (host propagate, fresh zero states)
    acts = []
    h = jnp.asarray(x)
    states = nnet.init_states(S)
    for c, p, s in zip(nnet.components, params, states):
        acts.append(h)
        if getattr(c, "uses_rng", False):
            h, _ = c.apply(p, h, s, rng=None, train=False)
        else:
            h, _ = c.apply(p, h, s)

    def tail_loss(y_i, layer):
        """Actual network loss as a function of layer `layer`'s output
        (xent on targets when given, else a fixed surrogate functional
        so the derivative structure is still real)."""
        h = y_i
        for c, p, s in list(zip(nnet.components, params, states))[layer + 1:]:
            if getattr(c, "uses_rng", False):
                h, _ = c.apply(p, h, s, rng=None, train=False)
            else:
                h, _ = c.apply(p, h, s)
        if have_targets:
            logp = jnp.log(jnp.clip(h, 1e-20, None))
            picked = jnp.take_along_axis(
                logp, jnp.asarray(ids)[..., None], axis=-1)
            return -jnp.sum(picked)
        key = jax.random.PRNGKey(0)
        probe = jax.random.normal(key, h.shape[-1:], h.dtype)
        return jnp.sum(h * probe)

    n_lstm = 0
    for li, (c, p) in enumerate(zip(nnet.components, params)):
        if not isinstance(c, _LstmBase):
            continue
        n_lstm += 1
        x_in = acts[li]
        y_out = c.apply(p, x_in, states[li], rng=None, train=False)[0]
        d_out = jax.grad(lambda y: tail_loss(y, li))(y_out)
        # variants module is time-major
        x_tm = np.asarray(x_in).swapaxes(0, 1)
        d_tm = np.asarray(d_out, np.float32).swapaxes(0, 1)
        c0 = np.zeros((S, c.cell_dim), np.float32)
        r0 = np.zeros((S, c.recur_dim), np.float32)
        Y = forward_full(p, x_tm, c0, r0, c.cell_clip)
        D, G = backward_variant(p, x_tm, c0, r0, d_tm, variant,
                                c.cell_clip)

        T = x_tm.shape[0]
        shown = T if print_frames < 0 else min(print_frames, T)
        for t in range(shown):
            print(f"[layer {li} {c.token}] forward-pass frame {t}",
                  file=out)
            for nm in ("g", "i", "f", "o", "c", "h", "m", "r"):
                print("  " + moment_statistics(f"y_{nm}",
                                               getattr(Y, nm)[t]), file=out)
        for t in range(shown - 1, -1, -1):
            print(f"[layer {li} {c.token}] backward-pass frame {t} "
                  f"(variant {variant})", file=out)
            for nm in ("r", "m", "h", "o", "c", "f", "i", "g"):
                print("  " + moment_statistics(f"d_{nm}",
                                               getattr(D, nm)[t]), file=out)
        for nm in ("w_gifo_x", "w_gifo_r", "bias", "peephole_i_c",
                   "peephole_f_c", "peephole_o_c", "w_r_m"):
            print("  " + moment_statistics(f"{nm}_corr", getattr(G, nm)),
                  file=out)

        path = os.path.join(dump_dir, f"layer{li}.{c.token}.npz")
        np.savez(path,
                 **{f"y_{nm}": getattr(Y, nm) for nm in Y._fields},
                 **{f"d_{nm}": getattr(D, nm) for nm in D._fields},
                 **{f"grad_{nm}": getattr(G, nm) for nm in G._fields})
        LOG(f"debug dump: wrote {path} (x {x_tm.shape}, variant {variant})")
    if n_lstm == 0:
        LOG("debug dump: model has no LSTM layers, nothing dumped")
    return n_lstm


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("model_in")
    p.add_argument("feature_rspecifier")
    p.add_argument("dump_dir")
    p.add_argument("--targets", default="",
                   help="posterior rspecifier; when given the dumped "
                        "derivatives come from the real xent loss")
    p.add_argument("--num-stream", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--variant", type=int, default=1, choices=(1, 2, 3),
                   help="reference gradient version "
                        "(bd-nnet-lstm-projected-streams.h:388-405)")
    p.add_argument("--print-frames", type=int, default=3,
                   help="frames to print moment lines for (-1 = all)")
    p.add_argument("--feature-transform", default="")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    nnet, params = Nnet.read(args.model_in)
    transf = tp = None
    if args.feature_transform:
        transf, tp = Nnet.read(args.feature_transform)
    raw_dim = transf.input_dim if transf else nnet.input_dim
    x, ids = _load_chunk(args.feature_rspecifier, args.targets,
                         args.num_stream, args.batch_size, raw_dim)
    if transf is not None:
        x = np.asarray(transf.feedforward(tp, jnp.asarray(x)))
    debug_dump(nnet, params, x, ids, args.dump_dir, args.variant,
               args.print_frames, have_targets=bool(args.targets))
    return 0


if __name__ == "__main__":
    sys.exit(main())
