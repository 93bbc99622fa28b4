"""A/B the grouped flagship train step (G batches per dispatch) in f32
vs bf16 matmul mode, same process. Decides whether the bench.py headline
can take the bf16 path (convergence parity already validated at flagship
scale: tools_dev/tpu_convergence_check.py f32 bf16 -> 55.9% / 55.9%).

Usage: python tools_dev/bench_bf16_grouped.py [S] [G]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.models.components import set_matmul_dtype
from kaldi_lstm_tpu.train import TrainOptions, init_momentum
from kaldi_lstm_tpu.train.trainer import make_grouped_train_step

from bench import PROTO, FRAMES_PER_AUDIO_SECOND


def measure(S, T, G, warmup=1, iters=5):
    nnet, params0 = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    gstep = make_grouped_train_step(
        nnet, TrainOptions(learn_rate=1e-5, momentum=0.9))
    params = jax.tree_util.tree_map(jnp.array, params0)
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

    def host_sync():
        return float(jnp.sum(params[1].bias))

    for _ in range(warmup):
        params, opt, states, aux = gstep(params, opt, states, (), feats,
                                         ids, w, mask, flags, lr)
    host_sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, states, aux = gstep(params, opt, states, (), feats,
                                         ids, w, mask, flags, lr)
    host_sync()
    dt = time.perf_counter() - t0
    sps = iters * G / dt
    return sps * S * T / FRAMES_PER_AUDIO_SECOND, sps


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(f"devices: {jax.devices()}", file=sys.stderr)

    tput32, sps32 = measure(S, 20, G)
    print(f"f32  grouped x{G} S={S}: {tput32:.1f} audio-s/s "
          f"({sps32:.1f} steps/s)")

    set_matmul_dtype(jnp.bfloat16)
    try:
        tput16, sps16 = measure(S, 20, G)
    finally:
        set_matmul_dtype(None)
    print(f"bf16 grouped x{G} S={S}: {tput16:.1f} audio-s/s "
          f"({sps16:.1f} steps/s)  [{tput16 / tput32 - 1:+.1%}]")


if __name__ == "__main__":
    main()
