"""Ablate the LSTM cell body to attribute kernel time between MXU dots
and VPU gate math: monkeypatch _cell_forward with (a) the real cell,
(b) transcendentals replaced by cheap linear ops, (c) gate math removed
entirely (dots only). K-scan per dispatch amortizes the ~1 ms axon
dispatch latency (see bench_lstm_blocks.py)."""

import sys
import time

import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import kaldi_lstm_tpu.ops.lstm_pallas as lp
from kaldi_lstm_tpu.ops import init_lstm_params, zero_state

S, T, I, C, R = 512, 20, 40, 800, 512
K = 8


def timeit(step, carry, iters=20, warmup=4):
    for _ in range(warmup):
        carry = step(carry)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(carry)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    return (time.perf_counter() - t0) / iters / K


def cell_linear(xw_t, c_prev, r_prev, wr_ref, wcr_ref, peep_ref, *,
                cp, cell_clip):
    """Same dots + elementwise structure, transcendentals -> linear."""
    gifo = xw_t + jnp.dot(r_prev, wr_ref[:],
                          preferred_element_type=jnp.float32)
    g = gifo[:, :cp] * 0.5
    i = gifo[:, cp:2 * cp] * 0.25 + peep_ref[0:1] * c_prev
    f = gifo[:, 2 * cp:3 * cp] * 0.25 + peep_ref[1:2] * c_prev
    o_pre = gifo[:, 3 * cp:]
    c = g * i + c_prev * f
    c = jnp.clip(c, -cell_clip, cell_clip)
    h = c * 0.5
    o = o_pre * 0.25 + peep_ref[2:3] * c
    m = h * o
    r = jnp.dot(m.astype(wcr_ref.dtype), wcr_ref[:],
                preferred_element_type=jnp.float32)
    return g, i, f, o, c, r


def cell_dots_only(xw_t, c_prev, r_prev, wr_ref, wcr_ref, peep_ref, *,
                   cp, cell_clip):
    """Only the two recurrence dots; minimal elementwise."""
    gifo = xw_t + jnp.dot(r_prev, wr_ref[:],
                          preferred_element_type=jnp.float32)
    c = gifo[:, :cp] + c_prev
    r = jnp.dot(c.astype(wcr_ref.dtype), wcr_ref[:],
                preferred_element_type=jnp.float32)
    z = gifo[:, :cp]
    return z, z, z, z, c, r


def bench(tag):
    key = jax.random.PRNGKey(0)
    params = init_lstm_params(key, I, C, R, 0.02)
    x = jax.random.normal(jax.random.PRNGKey(1), (S, T, I))
    st0 = zero_state(S, C, R)

    @jax.jit
    def fwd(state):
        def body(s, _):
            _, fin = lp.lstm_scan_pallas(params, x, s)
            return fin, 0
        s, _ = jax.lax.scan(body, state, None, length=K)
        return s

    def loss(p):
        out, fin = lp.lstm_scan_pallas(p, x, st0)
        return jnp.sum(out) + jnp.sum(fin.c)

    @jax.jit
    def train(p):
        def body(q, _):
            g = jax.grad(loss)(q)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-7 * b, q, g), 0
        q, _ = jax.lax.scan(body, p, None, length=K)
        return q

    tf = timeit(fwd, st0)
    tg = timeit(train, params)
    print(f"{tag:12s}: fwd {tf*1e3:7.3f} ms | fwd+bwd {tg*1e3:7.3f} ms",
          flush=True)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    real = lp._cell_forward
    bench("real")
    lp._cell_forward = lambda *a, **k: cell_linear(*a, **k)
    bench("linear-gates")
    lp._cell_forward = lambda *a, **k: cell_dots_only(*a, **k)
    bench("dots-only")
    lp._cell_forward = real


if __name__ == "__main__":
    main()
