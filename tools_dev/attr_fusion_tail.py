"""Name the ops in the grouped-step device-time tail (VERDICT r4 #6).

Compiles the same grouped train step profile_step.py traces, then prints
the HLO definition line for each requested op name, so the trace rows
("fusion.42", "pad_convert_fusion.7", ...) can be attributed to actual
computation. Run on the target backend (the compiled module and its op
names are backend-specific).

Usage: python tools_dev/attr_fusion_tail.py [S] [G] [bf16] name1 name2 ...
With no names, prints every fusion/copy/pad/slice/convert definition.
"""

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import TrainOptions, init_momentum
from kaldi_lstm_tpu.train.trainer import make_grouped_train_step

from bench import PROTO


def main():
    args = sys.argv[1:]
    S = int(args.pop(0)) if args and args[0].isdigit() else 512
    G = int(args.pop(0)) if args and args[0].isdigit() else 32
    bf16 = "bf16" in args
    names = [a for a in args if a != "bf16"]

    if bf16:
        from kaldi_lstm_tpu.models.components import set_matmul_dtype
        set_matmul_dtype(jnp.bfloat16)
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    opts = TrainOptions(learn_rate=1e-5, momentum=0.9)
    gstep = make_grouped_train_step(nnet, opts)
    params = jax.tree_util.tree_map(jnp.array, params)
    opt = init_momentum(params)
    states = nnet.init_states(S)
    nclass = nnet.output_dim
    rng = np.random.RandomState(0)
    T = 20
    feats = jnp.asarray(rng.randn(G, S, T, 40), jnp.float32)
    ids = jnp.asarray(rng.randint(0, nclass, (G, S, T, 1)), jnp.int32)
    w = jnp.ones((G, S, T, 1), jnp.float32)
    mask = jnp.ones((G, S, T), jnp.float32)
    flags = jnp.zeros((G, S), jnp.int32)
    lr = jnp.float32(1e-5)

    compiled = jax.jit(gstep).lower(
        params, opt, states, (), feats, ids, w, mask, flags, lr).compile()
    txt = compiled.as_text()
    print(f"HLO module: {len(txt.splitlines())} lines", file=sys.stderr)

    # index: op name -> its definition line (and for fusions, the called
    # computation's root line)
    defs = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=", line)
        if m:
            defs[m.group(1)] = line.strip()

    if not names:
        names = [n for n in defs
                 if re.match(r"(fusion|copy|pad|slice|convert|broadcast|"
                             r"dynamic-update-slice|mini-gather)", n)]
    for n in sorted(names):
        line = defs.get(n) or defs.get(n.replace("-done", "-start"))
        if line is None:
            print(f"{n}: NOT FOUND")
            continue
        # pull the called computation for fusions so the row says what
        # the fusion computes, not just "fusion"
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        extra = ""
        if cm:
            comp = cm.group(1)
            # root line of the called computation
            block = re.search(
                re.escape(comp) + r"[^{]*\{(.*?)\n\}", txt, re.S)
            if block:
                roots = [l.strip() for l in block.group(1).splitlines()
                         if "ROOT" in l]
                if roots:
                    extra = "\n      " + roots[0][:240]
        print(f"{n}:\n  {line[:240]}{extra}")


if __name__ == "__main__":
    main()
