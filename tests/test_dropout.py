"""LSTM gate dropout (inverted, on the input-projection pre-activations —
the feature the reference stubs out at …streams.h:247-256 / README Q4)."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import TrainOptions, run_epoch

PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 8 <CellDim> 10 <ParamScale> 0.1 <NumStream> 2 <DropoutRate> 0.3
<AffineTransform> <InputDim> 8 <OutputDim> 5 <ParamStddev> 0.1
<Softmax> <InputDim> 5 <OutputDim> 5
</NnetProto>
"""


def build():
    return Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))


def test_proto_and_serialization_keep_rate():
    nnet, params = build()
    assert nnet.components[0].dropout_rate == 0.3
    for binary in (True, False):
        buf = io.BytesIO()
        nnet.write_stream(buf, params, binary=binary)
        buf.seek(0)
        nnet2, _ = Nnet.read_stream(io.BufferedReader(buf))
        assert abs(nnet2.components[0].dropout_rate - 0.3) < 1e-6


def test_eval_deterministic_train_stochastic():
    nnet, params = build()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 6))
    y1, _ = nnet.propagate(params, x)            # eval: no dropout
    y2, _ = nnet.propagate(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    ya, _ = nnet.propagate(params, x, rng=jax.random.PRNGKey(2),
                           train=True)
    yb, _ = nnet.propagate(params, x, rng=jax.random.PRNGKey(3),
                           train=True)
    assert float(jnp.abs(ya - yb).max()) > 1e-6
    # same rng -> same mask
    yc, _ = nnet.propagate(params, x, rng=jax.random.PRNGKey(2),
                           train=True)
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yc))


def test_inverted_dropout_preserves_expectation():
    """Mean over many masks approximates the no-dropout pre-activations
    (retention scaling — the part the reference never implemented)."""
    nnet, params = build()
    lstm = nnet.components[0]
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 6))
    keep = 1.0 - lstm.dropout_rate
    masks = [lstm._dropout_mask(jax.random.PRNGKey(i), x)
             for i in range(300)]
    # bool keep-masks; the 1/keep retention scaling happens in the scan
    mean_mask = np.mean([np.asarray(m, np.float32) / keep
                         for m in masks], axis=0)
    np.testing.assert_allclose(mean_mask, 1.0, atol=0.15)


def test_pallas_dropout_matches_scan():
    """The Pallas kernels with a bool keep-mask must match lax.scan with
    the equivalent float multiplier: forward and the full VJP."""
    import jax.numpy as jnp
    from kaldi_lstm_tpu.ops import init_lstm_params, lstm_scan, zero_state
    from kaldi_lstm_tpu.ops.lstm_pallas import lstm_scan_pallas

    S, T, I, C, R = 3, 6, 5, 9, 7
    keep = 0.7
    params = init_lstm_params(jax.random.PRNGKey(0), I, C, R, 0.3)
    x = jax.random.normal(jax.random.PRNGKey(1), (S, T, I))
    st = zero_state(S, C, R)
    mask = jax.random.bernoulli(jax.random.PRNGKey(2), keep, (S, T, 4 * C))

    def loss_scan(p):
        out, fin = lstm_scan(p, x, st,
                             gate_dropout_mask=mask.astype(x.dtype) / keep)
        return jnp.sum(out * jnp.cos(0.1 * jnp.arange(out.size)
                                     .reshape(out.shape))) + jnp.sum(fin.c)

    def loss_pal(p):
        out, fin = lstm_scan_pallas(p, x, st, interpret=True,
                                    gate_keep_mask=mask, keep_prob=keep)
        return jnp.sum(out * jnp.cos(0.1 * jnp.arange(out.size)
                                     .reshape(out.shape))) + jnp.sum(fin.c)

    np.testing.assert_allclose(float(loss_pal(params)),
                               float(loss_scan(params)), rtol=1e-5)
    g_ref = jax.grad(loss_scan)(params)
    g_pal = jax.grad(loss_pal)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    # time-major variant
    def loss_pal_tm(p):
        out, fin = lstm_scan_pallas(p, x.swapaxes(0, 1), st,
                                    interpret=True, time_major=True,
                                    gate_keep_mask=mask.swapaxes(0, 1),
                                    keep_prob=keep)
        out = out.swapaxes(0, 1)
        return jnp.sum(out * jnp.cos(0.1 * jnp.arange(out.size)
                                     .reshape(out.shape))) + jnp.sum(fin.c)

    np.testing.assert_allclose(float(loss_pal_tm(params)),
                               float(loss_scan(params)), rtol=1e-5)


def test_training_with_dropout_learns():
    from tests.test_trainer import make_sched
    nnet, params = build()
    nnet.components[0].dropout_rate = 0.1
    opts = TrainOptions(learn_rate=0.05, momentum=0.9)
    res1 = run_epoch(nnet, params, make_sched(), opts)
    avg1 = (res1.stats.loss - res1.stats.entropy) / res1.stats.frames
    params, opt = res1.params, res1.opt_state
    for _ in range(4):
        res = run_epoch(nnet, params, make_sched(), opts, opt_state=opt)
        params, opt = res.params, res.opt_state
    avgN = (res.stats.loss - res.stats.entropy) / res.stats.frames
    assert avgN < avg1 - 0.03

    # cross-validation ignores dropout: deterministic
    r1 = run_epoch(nnet, params, make_sched(), opts, crossvalidate=True)
    r2 = run_epoch(nnet, params, make_sched(), opts, crossvalidate=True)
    assert r1.stats.loss == r2.stats.loss
