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


def test_top_p_reconstruction():
    """top_p == num_pdfs must reconstruct the dense block exactly; a
    moderate top_p must keep every fetched value exact and floor the
    rest strictly below the fetched minimum."""
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(3))
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 6).astype(np.float32)
    dense = OnlineBatchScorer(nnet, params, 2).score(x)
    full = OnlineBatchScorer(nnet, params, 2, top_p=10).score(x)
    np.testing.assert_allclose(full, dense, rtol=1e-6, atol=1e-6)
    part = OnlineBatchScorer(nnet, params, 2, top_p=4,
                             floor_margin=5.0).score(x)
    # fetched entries exact
    order = np.argsort(-dense, axis=-1)
    top4 = np.take_along_axis(dense, order[..., :4], axis=-1)
    got4 = np.take_along_axis(part, order[..., :4], axis=-1)
    np.testing.assert_allclose(got4, top4, rtol=1e-6, atol=1e-6)
    # the rest sit at the per-frame floor, strictly below the top-4 min
    rest = np.take_along_axis(part, order[..., 4:], axis=-1)
    floor = top4.min(axis=-1, keepdims=True) - 5.0
    np.testing.assert_allclose(rest, np.broadcast_to(floor, rest.shape),
                               rtol=1e-5, atol=1e-5)


def test_top_p_decode_parity():
    """Word-decode on top-P floored log-likelihoods must match the
    full-posterior decode in the regime the pruned fetch targets:
    PEAKED (trained-AM-like) posteriors, where the tail mass the floor
    replaces never enters the beam. (Scorer top-k exactness is pinned
    by test_top_p_reconstruction; this validates the serving
    approximation end-to-end through the decoder.)"""
    from kaldi_lstm_tpu.decode.faster import decode_faster
    from kaldi_lstm_tpu.decode.graph import build_decoding_graph
    from kaldi_lstm_tpu.io.arpa import uniform_unigram
    from kaldi_lstm_tpu.io.transition_model import \
        make_monophone_transition_model

    rng = np.random.RandomState(7)
    nph, sps = 12, 2
    npdfs = nph * sps
    tm = make_monophone_transition_model(nph, sps)
    lex = {f"w{i}": [[int(p) for p in rng.randint(2, nph + 1,
                                                  rng.randint(2, 4))]]
           for i in range(8)}
    vocab = sorted(lex)
    graph = build_decoding_graph(tm, lex, uniform_unigram(vocab))
    means = np.random.RandomState(8).randn(npdfs, 6)
    for trial in range(4):
        pdfs = []
        for w in [vocab[rng.randint(len(vocab))] for _ in range(3)]:
            for ph in lex[w][0]:
                for s in range(sps):
                    pdf = (ph - 1) * sps + s
                    pdfs.append(pdf)
                    if rng.rand() < 0.5:
                        pdfs.append(pdf)
        feats = means[pdfs] + rng.randn(len(pdfs), 6) * 0.5
        llk = -0.5 * ((feats[:, None, :] - means[None, :, :]) ** 2) \
            .sum(-1)
        # the serving transform: keep top-P per frame, floor the rest
        P = 8
        order = np.argsort(-llk, axis=-1)
        keep = np.take_along_axis(llk, order[:, :P], axis=-1)
        floored = np.broadcast_to(
            keep.min(-1, keepdims=True) - 10.0, llk.shape).copy()
        np.put_along_axis(floored, order[:, :P], keep, axis=-1)
        a = decode_faster(graph, llk, 1.0, 16.0)
        b = decode_faster(graph, floored, 1.0, 16.0)
        assert a.words == b.words, f"trial {trial}"


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


def test_pipeline_mode_shifted_identical():
    """Pipelined scoring must produce exactly the eager results,
    shifted one tick (dispatch k returns k-1's block; flush drains)."""
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(4))
    rng = np.random.RandomState(4)
    chunks = [rng.randn(2, 3, 6).astype(np.float32) for _ in range(4)]
    eager = OnlineBatchScorer(nnet, params, 2)
    want = [eager.score(c) for c in chunks]
    pipe = OnlineBatchScorer(nnet, params, 2, pipeline=True)
    got = [pipe.score(c) for c in chunks]
    assert got[0] is None
    got = got[1:] + [pipe.flush()]
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
    assert pipe.flush() is None
