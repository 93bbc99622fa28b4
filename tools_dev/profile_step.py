"""Device-time attribution of the flagship grouped train step: run it
under jax.profiler, parse the trace-viewer JSON, and sum op durations
grouped by kernel/fusion name. ROADMAP item 2 tooling.

Usage: python tools_dev/profile_step.py [S] [G]
"""

import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import TrainOptions, init_momentum
from kaldi_lstm_tpu.train.trainer import make_grouped_train_step

from bench import PROTO, PROTO_DEEP  # flagship / deep topologies


def run_step(S=512, T=20, G=8, iters=4, deep=False, bf16=False):
    proto = PROTO_DEEP if deep else PROTO
    if bf16:
        from kaldi_lstm_tpu.models.components import set_matmul_dtype
        set_matmul_dtype(jnp.bfloat16)
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    opts = TrainOptions(learn_rate=1e-5, momentum=0.9)
    gstep = make_grouped_train_step(nnet, opts)
    params = jax.tree_util.tree_map(jnp.array, params)
    opt = init_momentum(params)
    states = nnet.init_states(S)
    nclass = nnet.output_dim
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(G, S, T, 40), jnp.float32)
    ids = jnp.asarray(rng.randint(0, nclass, (G, S, T, 1)), jnp.int32)
    w = jnp.ones((G, S, T, 1), jnp.float32)
    mask = jnp.ones((G, S, T), jnp.float32)
    flags = jnp.zeros((G, S), jnp.int32)
    lr = jnp.float32(1e-5)

    def one():
        nonlocal params, opt, states
        params, opt, states, aux = gstep(params, opt, states, (), feats,
                                         ids, w, mask, flags, lr)

    one()  # compile
    float(jnp.sum(params[1].bias))

    trace_dir = "/tmp/klt_profile"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            one()
        float(jnp.sum(params[1].bias))
    return trace_dir, iters, G


def parse(trace_dir, iters, G):
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace written", file=sys.stderr)
        return 1
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    # device-side complete events: pid whose process name mentions TPU
    dev_pids = set()
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name.lower() \
                    or "xla" in name.lower():
                dev_pids.add(e["pid"])
    by_name = defaultdict(float)
    total = 0.0
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        # skip trace-viewer grouping rows, per-iteration step lanes
        # (bare numbers), and the jit/while parents that double-count
        # their children
        if name.startswith(("Steps", "XLA Modules", "XLA TraceMe",
                            "jit_", "while")) or name.isdigit():
            continue
        dur = e.get("dur", 0) / 1e3   # us -> ms
        by_name[name] += dur
        total += dur
    per_step = 1.0 / (iters * G)
    print(f"device total {total * per_step:.3f} ms/step "
          f"({iters} iters x G={G})")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])
    for name, dur in rows[:40]:
        print(f"  {dur * per_step:7.3f} ms  {name[:100]}")
    # the sub-0.1 ms tail (VERDICT r4 #6 fusion slack): how many ops,
    # how much total, and what they are
    tail = [(n, d) for n, d in rows if d * per_step < 0.1]
    tail_total = sum(d for _, d in tail) * per_step
    print(f"sub-0.1ms tail: {len(tail)} ops, {tail_total:.3f} ms/step "
          f"({100 * tail_total / max(total * per_step, 1e-9):.1f}% of "
          f"device)")
    for name, dur in tail[:40]:
        print(f"    {dur * per_step:7.4f} ms  {name[:100]}")
    return 0


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    deep = "deep" in sys.argv[3:]
    bf16 = "bf16" in sys.argv[3:]
    print("devices:", jax.devices(), file=sys.stderr)
    td, iters, G = run_step(S=S, G=G, deep=deep, bf16=bf16)
    return parse(td, iters, G)


if __name__ == "__main__":
    sys.exit(main())
