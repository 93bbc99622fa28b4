"""OnlineBatchScorer: batched multi-session streaming AM scoring must
equal per-session scoring exactly (same carried-state math as the
trainer's stream batching), and per-session reset must zero exactly the
requested sessions' states."""

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.decode.online import OnlineBatchScorer
from kaldi_lstm_tpu.models import Nnet

PROTO = """<NnetProto>
<Transmit> <InputDim> 6 <OutputDim> 6
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 8 <CellDim> 12 <ParamScale> 0.1 <NumStream> 1
<AffineTransform> <InputDim> 8 <OutputDim> 10 <ParamStddev> 0.1
<Softmax> <InputDim> 10 <OutputDim> 10
</NnetProto>
"""


def _single_session_ll(nnet, params, chunks):
    """Reference: one stream scored chunk-by-chunk with carried state."""
    states = nnet.init_states(1)
    outs = []
    for ch in chunks:
        y, states = nnet.propagate(params, jnp.asarray(ch)[None],
                                   states, logits=True)
        outs.append(np.asarray(jax.nn.log_softmax(y, axis=-1))[0])
    return np.concatenate(outs, axis=0)


def test_batched_equals_per_session():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    N, T = 3, 4
    rng = np.random.RandomState(0)
    feats = rng.randn(N, 3 * T, 6).astype(np.float32)
    sc = OnlineBatchScorer(nnet, params, N)
    got = np.concatenate(
        [sc.score(feats[:, k * T:(k + 1) * T]) for k in range(3)],
        axis=1)
    for s in range(N):
        ref = _single_session_ll(
            nnet, params, [feats[s, k * T:(k + 1) * T]
                           for k in range(3)])
        np.testing.assert_allclose(got[s], ref, rtol=2e-5, atol=2e-5)


def test_reset_zeroes_only_requested_sessions():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(1))
    N, T = 4, 5
    rng = np.random.RandomState(1)
    sc = OnlineBatchScorer(nnet, params, N)
    sc.score(rng.randn(N, T, 6).astype(np.float32))
    chunk2 = rng.randn(N, T, 6).astype(np.float32)

    sc2 = OnlineBatchScorer(nnet, params, N)  # fresh states
    fresh = sc2.score(chunk2)

    carried = OnlineBatchScorer(nnet, params, N)
    carried.score(rng.randn(N, T, 6).astype(np.float32) * 0)  # zero in
    # zero input still moves the state (biases), so carried != fresh

    sc.reset([1, 3])
    got = sc.score(chunk2)
    # reset sessions behave like fresh ones...
    np.testing.assert_allclose(got[1], fresh[1], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[3], fresh[3], rtol=2e-5, atol=2e-5)
    # ...non-reset sessions do not
    assert np.abs(got[0] - fresh[0]).max() > 1e-6
    assert np.abs(got[2] - fresh[2]).max() > 1e-6


def test_log_prior_and_fetch_dtype():
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(2))
    rng = np.random.RandomState(2)
    prior = np.log(np.full(10, 0.1, np.float32))
    x = rng.randn(2, 4, 6).astype(np.float32)
    a = OnlineBatchScorer(nnet, params, 2).score(x)
    b = OnlineBatchScorer(nnet, params, 2, log_prior=prior).score(x)
    np.testing.assert_allclose(b, a - prior, rtol=1e-5, atol=1e-5)
    c = OnlineBatchScorer(nnet, params, 2,
                          fetch_dtype=jnp.bfloat16).score(x)
    assert c.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(c, np.float32), a,
                               rtol=0.02, atol=0.02)
