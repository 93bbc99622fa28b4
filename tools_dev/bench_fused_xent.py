"""A/B the fused affine+softmax+xent path on the deep config
(2x LSTMP -> 16624 senones) and the flagship 8000-senone config."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, \
    make_train_step

T = 20

PROTOS = {
    "8000": """<NnetProto>
<Transmit> <InputDim> 40 <OutputDim> 40
<LstmProjectedStreams> <InputDim> 40 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> 256
<AffineTransform> <InputDim> 512 <OutputDim> 8000 <ParamStddev> 0.04
<Softmax> <InputDim> 8000 <OutputDim> 8000
</NnetProto>""",
    "deep16624": """<NnetProto>
<Transmit> <InputDim> 40 <OutputDim> 40
<LstmProjectedStreams> <InputDim> 40 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> 256
<LstmProjectedStreams> <InputDim> 512 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> 256
<AffineTransform> <InputDim> 512 <OutputDim> 16624 <ParamStddev> 0.04
<Softmax> <InputDim> 16624 <OutputDim> 16624
</NnetProto>""",
}


def run(name, fused, S=256, iters=20, warmup=3):
    nnet, params = Nnet.init_from_proto(PROTOS[name],
                                        jax.random.PRNGKey(0))
    K = nnet.output_dim
    step = make_train_step(nnet, TrainOptions(learn_rate=1e-6,
                                              momentum=0.9,
                                              fused_xent=fused))
    params = jax.tree_util.tree_map(jnp.array, params)
    opt = init_momentum(params)
    states = nnet.init_states(S)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(S, T, 40), jnp.float32)
    ids = jnp.asarray(rng.randint(0, K, (S, T, 1)), jnp.int32)
    w1 = jnp.ones((S, T, 1), jnp.float32)
    mask = jnp.ones((S, T), jnp.float32)
    flags = jnp.zeros((S,), jnp.int32)
    lr = jnp.float32(1e-6)

    def sync():
        return float(jnp.sum(params[-2]["bias"]))

    for _ in range(warmup):
        params, opt, states, aux = step(params, opt, states, (), feats,
                                        ids, w1, mask, flags, lr)
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, states, aux = step(params, opt, states, (), feats,
                                        ids, w1, mask, flags, lr)
    sync()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:10s} fused={int(fused)}: {dt*1e3:7.3f} ms/step "
          f"({S*T/dt/100:8.0f} audio-s/s)  xent={float(aux.xent):.3e}",
          flush=True)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    for name in ("8000", "deep16624"):
        for fused in (False, True):
            run(name, fused)


if __name__ == "__main__":
    main()
