"""Sweep fused-xent frame/class tiles on the flagship shape in ONE
process (per-process TPU claim + compile makes bash-loop sweeps
impractical); tiles are module constants, so each config reloads the
module."""

import importlib
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N, R, K = 512 * 20, 512, 8000


def run(ft, kt):
    os.environ["KLT_XENT_FRAME_TILE"] = str(ft)
    os.environ["KLT_XENT_CLASS_TILE"] = str(kt)
    import kaldi_lstm_tpu.ops.xent_pallas as xp
    importlib.reload(xp)

    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(N, R), jnp.float32)
    w = jnp.asarray(rng.randn(K, R) * 0.05, jnp.float32)
    b = jnp.zeros((K,), jnp.float32)
    ids = jnp.asarray(rng.randint(0, K, (N, 1)), jnp.int32)
    tw = jnp.ones((N, 1), jnp.float32)
    mask = jnp.ones((N,), jnp.float32)

    @jax.jit
    def train(w):
        g = jax.grad(lambda w: xp.fused_affine_xent(
            r, w, b, ids, tw, mask, False)[0])(w)
        return w - 1e-9 * g

    for _ in range(3):
        w = train(w)
    float(jnp.sum(w))
    t0 = time.perf_counter()
    for _ in range(30):
        w = train(w)
    float(jnp.sum(w))
    dt = (time.perf_counter() - t0) / 30
    print(f"ft={ft:4d} kt={kt:5d}: {dt*1e3:7.3f} ms fwd+bwd", flush=True)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    for ft, kt in [(256, 512), (128, 1024), (256, 1024), (512, 1024),
                   (256, 2048), (512, 2048)]:
        run(ft, kt)


if __name__ == "__main__":
    main()
