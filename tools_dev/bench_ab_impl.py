"""A/B the full train step: lax.scan LSTM vs fused Pallas LSTM, S=256,
plus bf16 on/off — four full-step measurements in one process."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.models.components import set_matmul_dtype
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, \
    make_train_step

S, T, I, K = 256, 20, 40, 8000

PROTO = f"""<NnetProto>
<Transmit> <InputDim> {I} <OutputDim> {I}
<LstmProjectedStreams> <InputDim> {I} <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> {S}
<AffineTransform> <InputDim> 512 <OutputDim> {K} <ParamStddev> 0.04
<Softmax> <InputDim> {K} <OutputDim> {K}
</NnetProto>"""


def run(impl, bf16, nnet, params0):
    os.environ["KLT_LSTM_IMPL"] = impl
    set_matmul_dtype(jnp.bfloat16 if bf16 else None)
    step = make_train_step(nnet, TrainOptions(learn_rate=1e-6,
                                              momentum=0.9))
    params = jax.tree_util.tree_map(jnp.array, params0)
    opt = init_momentum(params)
    states = nnet.init_states(S)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(S, T, I), jnp.float32)
    ids = jnp.asarray(rng.randint(0, K, (S, T, 1)), jnp.int32)
    w1 = jnp.ones((S, T, 1), jnp.float32)
    mask = jnp.ones((S, T), jnp.float32)
    flags = jnp.zeros((S,), jnp.int32)
    lr = jnp.float32(1e-6)

    for _ in range(3):
        params, opt, states, aux = step(params, opt, states, (), feats,
                                        ids, w1, mask, flags, lr)
    float(jnp.sum(params[2]["bias"]))
    t0 = time.perf_counter()
    for _ in range(30):
        params, opt, states, aux = step(params, opt, states, (), feats,
                                        ids, w1, mask, flags, lr)
    float(jnp.sum(params[2]["bias"]))
    dt = (time.perf_counter() - t0) / 30
    print(f"impl={impl:6s} bf16={int(bf16)}: {dt*1e3:7.3f} ms/step "
          f"({S*T/dt/100:7.0f} audio-s/s)", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    for impl in ("scan", "pallas"):
        for bf16 in (False, True):
            run(impl, bf16, nnet, params)
    os.environ.pop("KLT_LSTM_IMPL", None)
    set_matmul_dtype(None)


if __name__ == "__main__":
    main()
