"""Decompose the S=256 train step cost: LSTM vs senone affine vs
softmax-xent loss vs optimizer. Chained timing with host sync."""

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
from kaldi_lstm_tpu.train.loss import masked_xent_loss
from kaldi_lstm_tpu.ops import init_lstm_params, zero_state
from kaldi_lstm_tpu.ops.lstm_pallas import lstm_scan_pallas

S, T, I, C, R, K = 256, 20, 40, 800, 512, 8000


def chain_time(step, carry, iters=20, warmup=3):
    for _ in range(warmup):
        carry = step(carry)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(carry)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    lstm_p = init_lstm_params(key, I, C, R, 0.02)
    w_aff = jnp.asarray(rng.randn(K, R) * 0.04, jnp.float32)
    b_aff = jnp.zeros((K,), jnp.float32)
    x = jnp.asarray(rng.randn(S, T, I), jnp.float32)
    r_fix = jnp.asarray(rng.randn(S, T, R), jnp.float32)
    ids = jnp.asarray(rng.randint(0, K, (S, T, 1)), jnp.int32)
    w1 = jnp.ones((S, T, 1), jnp.float32)
    mask = jnp.ones((S, T), jnp.float32)
    st0 = zero_state(S, C, R)

    # 1. LSTM fwd+bwd only
    @jax.jit
    def lstm_step(p):
        g = jax.grad(lambda p: jnp.sum(
            lstm_scan_pallas(p, x, st0)[0]))(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)

    t_lstm = chain_time(lstm_step, lstm_p)
    print(f"lstm fwd+bwd:        {t_lstm*1e3:7.3f} ms", flush=True)

    # 2. affine+loss fwd+bwd only (fixed r input)
    @jax.jit
    def aff_step(w):
        def f(w):
            logits = jnp.dot(r_fix.reshape(S * T, R), w.T,
                             preferred_element_type=jnp.float32) + b_aff
            loss, _ = masked_xent_loss(logits.reshape(S, T, K), ids, w1,
                                       mask)
            return loss
        g = jax.grad(f)(w)
        return w - 1e-9 * g

    t_aff = chain_time(aff_step, w_aff)
    print(f"affine+xent fwd+bwd: {t_aff*1e3:7.3f} ms", flush=True)

    # 3. loss only (fixed logits)
    logits_fix = jnp.asarray(rng.randn(S, T, K) * 0.1, jnp.float32)

    @jax.jit
    def loss_step(l):
        g = jax.grad(lambda l: masked_xent_loss(l, ids, w1, mask)[0])(l)
        return l - 1e-9 * g

    t_loss = chain_time(loss_step, logits_fix)
    print(f"xent fwd+bwd only:   {t_loss*1e3:7.3f} ms", flush=True)

    # 4. full train step
    proto = f"""<NnetProto>
<Transmit> <InputDim> {I} <OutputDim> {I}
<LstmProjectedStreams> <InputDim> {I} <OutputDim> {R} <CellDim> {C} <NumStream> {S}
<AffineTransform> <InputDim> {R} <OutputDim> {K} <ParamStddev> 0.04
<Softmax> <InputDim> {K} <OutputDim> {K}
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, key)
    step = make_train_step(nnet, TrainOptions(learn_rate=1e-6,
                                              momentum=0.9))
    opt = init_momentum(jax.tree_util.tree_map(jnp.array, params))
    states = nnet.init_states(S)
    flags = jnp.zeros((S,), jnp.int32)
    lr = jnp.float32(1e-6)

    carry = (jax.tree_util.tree_map(jnp.array, params), opt, states)

    def full(carry):
        p, o, s = carry
        p, o, s, aux = step(p, o, s, (), x, ids, w1, mask, flags, lr)
        return (p, o, s)

    for _ in range(3):
        carry = full(carry)
    float(jnp.sum(carry[0][2]["bias"]))
    t0 = time.perf_counter()
    for _ in range(20):
        carry = full(carry)
    float(jnp.sum(carry[0][2]["bias"]))
    t_full = (time.perf_counter() - t0) / 20
    print(f"full train step:     {t_full*1e3:7.3f} ms "
          f"({S*T/t_full/100:.0f} audio-s/s)", flush=True)


if __name__ == "__main__":
    main()
