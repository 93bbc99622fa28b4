"""3-D vs 2-D tail: is the [S, T, K] softmax/GEMM layout the problem?"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

S, T, R, K = 512, 100, 512, 8000


def timeit(fn, *args, iters=10):
    y = fn(*args)
    jax.block_until_ready(y)
    x = args[0]
    rest = args[1:]
    for _ in range(2):
        x = x + 1e-9 * jnp.sum(fn(x, *rest))
    float(jnp.sum(x.reshape(-1)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = x + 1e-9 * jnp.sum(fn(x, *rest))
    float(jnp.sum(x.reshape(-1)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(K, R).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(K), jnp.float32)
    x3 = jnp.asarray(rng.randn(S, T, R), jnp.float32)
    x2 = x3.reshape(S * T, R)

    def tail(a, ww, bb):
        return jax.nn.softmax(
            jnp.dot(a, ww.T, preferred_element_type=jnp.float32) + bb, -1)

    t3 = jax.jit(tail)
    print(f"tail 3D [S,T,K]: {timeit(t3, x3, w, b):.2f} ms")

    t2 = jax.jit(tail)
    print(f"tail 2D [N,K]: {timeit(t2, x2, w, b):.2f} ms")

    t3r = jax.jit(lambda a, ww, bb: tail(
        a.reshape(-1, a.shape[-1]), ww, bb).reshape(S, T, K))
    print(f"tail 3D via reshape->2D->reshape: "
          f"{timeit(t3r, x3, w, b):.2f} ms")

    sm3 = jax.jit(lambda a: jax.nn.softmax(a, -1))
    big3 = jnp.asarray(rng.randn(S, T, K), jnp.float32)
    print(f"softmax-only 3D [512,100,8000]: {timeit(sm3, big3):.2f} ms")


if __name__ == "__main__":
    main()
