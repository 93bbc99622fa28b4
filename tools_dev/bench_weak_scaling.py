"""Weak-scaling measurement harness: fixed per-device stream count,
growing device count (the BASELINE.json >90%-efficiency north star).

On real multi-chip hardware run as-is. On a virtual CPU mesh it only
validates the scaling STRUCTURE — the printed efficiency is meaningless
there (all "devices" share the same host cores):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python tools_dev/bench_weak_scaling.py
"""

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
from kaldi_lstm_tpu.train import TrainOptions, init_momentum

S_PER_DEVICE, T, I, K = 32, 20, 40, 8000

PROTO_TMPL = """<NnetProto>
<Transmit> <InputDim> {I} <OutputDim> {I}
<LstmProjectedStreams> <InputDim> {I} <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> {S}
<AffineTransform> <InputDim> 512 <OutputDim> {K} <ParamStddev> 0.04
<Softmax> <InputDim> {K} <OutputDim> {K}
</NnetProto>"""


def run(n_devices: int, iters=10, warmup=2) -> float:
    S = S_PER_DEVICE * n_devices
    model = 2 if n_devices >= 2 else 1
    data = n_devices // model
    mesh = make_mesh(data=data, model=model,
                     devices=jax.devices()[:n_devices])
    nnet, params = Nnet.init_from_proto(
        PROTO_TMPL.format(I=I, K=K, S=S), jax.random.PRNGKey(0))
    plan = MeshPlan(mesh, nnet)
    states = nnet.init_states(S)
    step = make_sharded_train_step(
        nnet, TrainOptions(learn_rate=1e-6, momentum=0.9), plan,
        params_example=params, states_example=states)

    params = plan.place_params(params)
    opt = init_momentum(params)
    states = plan.place_states(states)
    rng = np.random.RandomState(0)
    batch = plan.place_batch(
        rng.randn(S, T, I).astype(np.float32),
        rng.randint(0, K, (S, T, 1)).astype(np.int32),
        np.ones((S, T, 1), np.float32),
        np.ones((S, T), np.float32),
        np.zeros(S, np.int32))
    lr = jnp.float32(1e-6)

    for _ in range(warmup):
        params, opt, states, aux = step(params, opt, states, (), *batch,
                                        lr)
    float(jnp.sum(params[2]["bias"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, states, aux = step(params, opt, states, (), *batch,
                                        lr)
    float(jnp.sum(params[2]["bias"]))
    dt = (time.perf_counter() - t0) / iters
    return S * T / dt / 100.0  # audio-s/s total


def main():
    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].device_kind}", file=sys.stderr)
    counts = [n for n in (1, 2, 4, 8, 16) if n <= len(devs)]
    base = None
    for n in counts:
        tput = run(n)
        if base is None:
            base = tput
        eff = tput / (base * n) * 100.0
        print(f"devices={n:2d} S={S_PER_DEVICE * n:4d}: "
              f"{tput:9.1f} audio-s/s  weak-scaling eff {eff:5.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
