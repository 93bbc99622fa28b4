"""TPU numeric parity check: fused-input-projection Pallas kernels vs
the pure lax.scan reference (ops/lstm_cell.lstm_scan), forward + full
BPTT grads, with and without gate dropout. Run on the real chip (plain
python); CPU tests already cover interpret mode, where the comparison
is exact.

On TPU both sides use MXU f32 with different accumulation orders, so
per-element equality is not expected. Criterion per gradient tensor:
cosine distance <= 1e-5 AND max-rel (normalized by the tensor's max
magnitude) <= 5e-3. Measured on v5e (2026-08-18, flagship dims):
maxrel 1e-4..9e-4 for weights, ~3e-3 only for the tiny-magnitude
(max ~1e-5) c0/r0 grads; cos distance <= 4e-6 everywhere.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.ops import LstmState, init_lstm_params, lstm_scan
from kaldi_lstm_tpu.ops.lstm_pallas import lstm_scan_pallas

NAMES = ["w_gifo_x", "w_gifo_r", "bias", "peep_i", "peep_f", "peep_o",
         "w_r_m", "x", "c0", "r0"]


def check(S, T, I, C, R, dropout: bool, tag: str) -> bool:
    key = jax.random.PRNGKey(0)
    params = init_lstm_params(key, I, C, R, 0.05)
    x = jax.random.normal(jax.random.PRNGKey(1), (S, T, I))
    st0 = LstmState(
        c=jax.random.normal(jax.random.PRNGKey(2), (S, C)) * 0.1,
        r=jax.random.normal(jax.random.PRNGKey(3), (S, R)) * 0.1)
    mask = None
    kp = 1.0
    if dropout:
        kp = 0.8
        mask = jax.random.bernoulli(jax.random.PRNGKey(4), kp,
                                    (S, T, 4 * C))

    def loss_ref(p, xin, st):
        dm = None if mask is None else \
            mask.astype(jnp.float32) * (1.0 / kp)
        y, fin = lstm_scan(p, xin, st, gate_dropout_mask=dm)
        return jnp.mean(y ** 2) + jnp.mean(fin.c ** 2) \
            + jnp.mean(fin.r ** 2)

    def loss_ker(p, xin, st):
        y, fin = lstm_scan_pallas(p, xin, st, interpret=False,
                                  gate_keep_mask=mask, keep_prob=kp)
        return jnp.mean(y ** 2) + jnp.mean(fin.c ** 2) \
            + jnp.mean(fin.r ** 2)

    vref, gref = jax.jit(jax.value_and_grad(loss_ref, (0, 1, 2)))(
        params, x, st0)
    vker, gker = jax.jit(jax.value_and_grad(loss_ker, (0, 1, 2)))(
        params, x, st0)
    lrel = abs(float(vker) - float(vref)) / max(abs(float(vref)), 1e-12)
    ok = lrel <= 1e-5
    fs, _ = jax.tree_util.tree_flatten(gref)
    fk, _ = jax.tree_util.tree_flatten(gker)
    for n, a, b in zip(NAMES, fk, fs):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)
        cosd = 1.0 - float((a * b).sum() / max(
            np.linalg.norm(a) * np.linalg.norm(b), 1e-30))
        good = rel <= 5e-3 and cosd <= 1e-5
        ok &= good
        print(f"  {n:10s} maxrel={rel:8.2e} cosdist={cosd:8.2e}"
              f"{'' if good else '  <-- FAIL'}", file=sys.stderr)
    print(f"{tag}: loss_rel={lrel:.2e} -> {'OK' if ok else 'FAIL'}",
          file=sys.stderr)
    return ok


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    ok = True
    # flagship dims; non-128-multiple input dim exercises ip padding
    ok &= check(16, 20, 40, 800, 512, False, "flagship S=16")
    # odd dims everywhere + dropout mask path
    ok &= check(12, 20, 40, 200, 136, True, "odd-dims dropout")
    print("PARITY " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
