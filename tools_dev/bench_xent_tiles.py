"""Sweep fused-xent frame/class tiles on the flagship shape
(N = 512*20 frames, K = 8000). Run separately per tile config (tiles are
module constants bound at import):

    for ft in 128 256 512; do for kt in 512 1024 2048; do
      KLT_XENT_FRAME_TILE=$ft KLT_XENT_CLASS_TILE=$kt \
        python tools_dev/bench_xent_tiles.py; done; done
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.ops.xent_pallas import fused_affine_xent

N, R, K = 512 * 20, 512, 8000


def main():
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(N, R), jnp.float32)
    w = jnp.asarray(rng.randn(K, R) * 0.05, jnp.float32)
    b = jnp.zeros((K,), jnp.float32)
    ids = jnp.asarray(rng.randint(0, K, (N, 1)), jnp.int32)
    tw = jnp.ones((N, 1), jnp.float32)
    mask = jnp.ones((N,), jnp.float32)

    @jax.jit
    def train(w):
        g = jax.grad(lambda w: fused_affine_xent(r, w, b, ids, tw, mask,
                                                 False)[0])(w)
        return w - 1e-9 * g

    for _ in range(3):
        w = train(w)
    float(jnp.sum(w))
    t0 = time.perf_counter()
    for _ in range(30):
        w = train(w)
    float(jnp.sum(w))
    dt = (time.perf_counter() - t0) / 30
    print(f"ft={os.environ.get('KLT_XENT_FRAME_TILE', '256'):>4s} "
          f"kt={os.environ.get('KLT_XENT_CLASS_TILE', '512'):>5s}: "
          f"{dt*1e3:7.3f} ms fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
