"""bf16 matmul mode: numerics stay close to f32 and training still
learns (the accuracy-parity gate for enabling it in production)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.models.components import set_matmul_dtype
from kaldi_lstm_tpu.train import TrainOptions, run_epoch

PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 8 <CellDim> 10 <ParamScale> 0.1 <NumStream> 2
<AffineTransform> <InputDim> 8 <OutputDim> 5 <ParamStddev> 0.1
<Softmax> <InputDim> 5 <OutputDim> 5
</NnetProto>
"""


@pytest.fixture(autouse=True)
def reset_dtype():
    yield
    set_matmul_dtype(None)


def test_forward_close_to_f32():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6))
    y32, _ = nnet.propagate(params, x, nnet.init_states(2))
    set_matmul_dtype(jnp.bfloat16)
    y16, _ = nnet.propagate(params, x, nnet.init_states(2))
    assert y16.dtype == jnp.float32  # accumulate/output stays f32
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=0.05, atol=0.02)


def test_pallas_bf16_close_to_f32():
    from kaldi_lstm_tpu.ops import LstmState, init_lstm_params
    from kaldi_lstm_tpu.ops.lstm_pallas import lstm_scan_pallas
    key = jax.random.PRNGKey(0)
    params = init_lstm_params(key, 5, 9, 6, 0.3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 5))
    st = LstmState(c=jnp.zeros((2, 9)), r=jnp.zeros((2, 6)))
    out32, _ = lstm_scan_pallas(params, x, st, interpret=True)
    g32 = jax.grad(lambda p: jnp.sum(
        lstm_scan_pallas(p, x, st, interpret=True)[0]))(params)
    set_matmul_dtype(jnp.bfloat16)
    out16, _ = lstm_scan_pallas(params, x, st, interpret=True)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.05, atol=0.02)
    g16 = jax.grad(lambda p: jnp.sum(
        lstm_scan_pallas(p, x, st, interpret=True)[0]))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g32),
                    jax.tree_util.tree_leaves(g16)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0.1, atol=0.05)


def test_bf16_training_learns():
    from tests.test_trainer import make_sched
    set_matmul_dtype(jnp.bfloat16)
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    opts = TrainOptions(learn_rate=0.05, momentum=0.9)
    res1 = run_epoch(nnet, params, make_sched(), opts)
    avg1 = (res1.stats.loss - res1.stats.entropy) / res1.stats.frames
    params, opt = res1.params, res1.opt_state
    for _ in range(4):
        res = run_epoch(nnet, params, make_sched(), opts, opt_state=opt)
        params, opt = res.params, res.opt_state
    avgN = (res.stats.loss - res.stats.entropy) / res.stats.frames
    assert avgN < avg1 - 0.05
