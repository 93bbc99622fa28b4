"""On-chip check of the sharded train step with the TP fused-xent path:
a (1,1) mesh on the single real TPU must compile shard_map+Pallas and
match the plain single-device fused step numerically, at full speed.
(CPU-mesh tests cover multi-shard semantics in interpret mode; this
covers the compiled kernel under shard_map.)"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.parallel import MeshPlan, make_mesh, \
    make_sharded_train_step
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, \
    make_train_step

S, T, I, K = 256, 20, 40, 8000

PROTO = f"""<NnetProto>
<LstmProjectedStreams> <InputDim> {I} <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> {S}
<AffineTransform> <InputDim> 512 <OutputDim> {K} <ParamStddev> 0.04
<Softmax> <InputDim> {K} <OutputDim> {K}
</NnetProto>"""


def batch(seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(S, T, I), jnp.float32),
            jnp.asarray(rng.randint(0, K, (S, T, 1)), jnp.int32),
            jnp.ones((S, T, 1), jnp.float32),
            jnp.ones((S, T), jnp.float32),
            jnp.zeros((S,), jnp.int32))


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    nnet, params0 = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    opts = TrainOptions(learn_rate=1e-5, momentum=0.9, fused_xent=True)

    def run(step, place=None):
        params = jax.tree_util.tree_map(jnp.array, params0)
        opt = init_momentum(params)
        states = nnet.init_states(S)
        if place:
            params, opt, states = place(params, opt, states)
        feats, ids, w1, mask, flags = batch()
        lr = jnp.float32(1e-5)
        for _ in range(3):
            params, opt, states, aux = step(params, opt, states, (),
                                            feats, ids, w1, mask, flags,
                                            lr)
        float(jnp.sum(params[1]["bias"]))
        t0 = time.perf_counter()
        for _ in range(20):
            params, opt, states, aux = step(params, opt, states, (),
                                            feats, ids, w1, mask, flags,
                                            lr)
        xent = float(aux.xent)
        dt = (time.perf_counter() - t0) / 20
        return xent, dt

    plain = make_train_step(nnet, opts)
    x1, t1 = run(plain)
    print(f"plain fused step: xent={x1:.4f}  {t1*1e3:.3f} ms", flush=True)

    mesh = make_mesh(data=1, model=1)
    plan = MeshPlan(mesh, nnet)
    sharded = make_sharded_train_step(
        nnet, opts, plan, params_example=params0,
        states_example=nnet.init_states(S))

    def place(p, o, s):
        return (plan.place_params(p),
                jax.tree_util.tree_map(jnp.array, o), plan.place_states(s))

    x2, t2 = run(sharded, place)
    print(f"sharded(1,1) TP-fused: xent={x2:.4f}  {t2*1e3:.3f} ms",
          flush=True)
    rel = abs(x1 - x2) / max(abs(x1), 1e-9)
    print(f"xent rel diff {rel:.2e} -> {'OK' if rel < 1e-3 else 'FAIL'}",
          flush=True)


if __name__ == "__main__":
    main()
