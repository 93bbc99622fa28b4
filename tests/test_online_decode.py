"""Online (streaming) decoding: the incremental decoder must equal the
offline decoder exactly, the shift buffer must reproduce TimeShift
semantics, and the full OnlineRecognizer (chunked AM with carried LSTM
state + delay lookahead) must match whole-utterance scoring + offline
decoding end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_lstm_tpu.decode.faster import decode_faster
from kaldi_lstm_tpu.decode.graph import build_decoding_graph
from kaldi_lstm_tpu.decode.online import (
    OnlineDecoder,
    OnlineRecognizer,
    _ShiftBuffer,
)
from kaldi_lstm_tpu.models import Nnet

from tests.test_word_decode import _emit, _oracle_setup


def _chunks(arr, rng):
    t = 0
    while t < len(arr):
        n = int(rng.randint(1, 9))
        yield arr[t:t + n]
        t += n


def test_online_decoder_matches_offline():
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    lex, lm, tm, means, rng = _oracle_setup(num_words=8, seed=21)
    graph = build_decoding_graph(tm, lex, lm)
    for _ in range(5):
        sent = sample_sentence(rng, lm, sorted(lex), 7) or ["w000"]
        loglik = _emit(tm, lex, means, rng, sent, noise=0.6)
        ref = decode_faster(graph, loglik, 1.0, beam=14.0, max_active=40)
        dec = OnlineDecoder(graph, 1.0, beam=14.0, max_active=40)
        for chunk in _chunks(loglik, rng):
            dec.advance(chunk)
            part = dec.partial()          # callable at any point
            assert np.isfinite(part.score)
        res = dec.finalize()
        assert res.words == ref.words
        assert abs(res.score - ref.score) < 1e-9
        assert res.reached_final == ref.reached_final


def test_shift_buffer_is_time_shift():
    rng = np.random.RandomState(3)
    for T, k in [(17, 0), (17, 5), (6, 5), (4, 5), (30, 1)]:
        x = rng.randn(T, 4).astype(np.float32)
        buf = _ShiftBuffer(k)
        outs = [buf.push(c) for c in _chunks(x, rng)]
        outs.append(buf.flush())
        got = np.concatenate([o for o in outs if o.size], 0)
        src = np.clip(np.arange(T) + k, 0, T - 1)
        np.testing.assert_array_equal(got, x[src])


def test_shift_buffer_rejects_negative():
    with pytest.raises(ValueError):
        _ShiftBuffer(-1)


def _word_net(num_pdfs, feat_dim, seed=0):
    proto = f"""<NnetProto>
<Transmit> <InputDim> {feat_dim} <OutputDim> {feat_dim}
<LstmProjectedStreams> <InputDim> {feat_dim} <OutputDim> 16 <CellDim> 24 <ParamScale> 0.08 <NumStream> 1
<AffineTransform> <InputDim> 16 <OutputDim> {num_pdfs} <ParamStddev> 0.1
<Softmax> <InputDim> {num_pdfs} <OutputDim> {num_pdfs}
</NnetProto>"""
    return Nnet.init_from_proto(proto, jax.random.PRNGKey(seed))


def _offline_loglik(nnet, params, feats, delay, log_prior):
    """Whole-utterance reference scoring: shift features by the target
    delay (trainer :198-202 semantics), propagate once, log-softmax,
    subtract log-priors."""
    T = feats.shape[0]
    src = np.clip(np.arange(T) + delay, 0, T - 1)
    y, _ = nnet.propagate(params, jnp.asarray(feats[src])[None],
                          logits=True)
    ll = np.asarray(jax.nn.log_softmax(y[0], axis=-1), np.float64)
    return ll - log_prior


@pytest.mark.parametrize("delay", [0, 5])
def test_online_recognizer_matches_offline(delay):
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    lex, lm, tm, means, rng = _oracle_setup(num_words=6, seed=23)
    graph = build_decoding_graph(tm, lex, lm)
    nnet, params = _word_net(tm.num_pdfs, means.shape[1])
    log_prior = np.log(np.full(tm.num_pdfs, 1.0 / tm.num_pdfs))

    for i in range(3):
        sent = sample_sentence(rng, lm, sorted(lex), 5) or ["w000"]
        feats = means[np.concatenate([
            [(0)], rng.randint(0, tm.num_pdfs, 24)])].astype(np.float32)
        feats += rng.randn(*feats.shape).astype(np.float32) * 0.1
        ref_ll = _offline_loglik(nnet, params, feats, delay, log_prior)
        ref = decode_faster(graph, ref_ll, 0.5, beam=200.0)

        rec = OnlineRecognizer(nnet, params, graph, log_prior=log_prior,
                               acoustic_scale=0.5, beam=200.0,
                               targets_delay=delay)
        for chunk in _chunks(feats, rng):
            rec.accept(chunk)
        res = rec.finalize()
        assert res.words == ref.words
        assert abs(res.score - ref.score) < 1e-3


def test_online_recognizer_takes_delay_from_timeshift():
    """A standard-format decode net (TimeShift + LstmProjected): the
    recognizer strips the TimeShift, uses its <Shift> as lookahead, and
    converts the LSTM to the stateful streams form — equal to offline
    feedforward (TimeShift inside) + offline decode."""
    lex, lm, tm, means, rng = _oracle_setup(num_words=6, seed=29)
    graph = build_decoding_graph(tm, lex, lm)
    gnet, params = _word_net(tm.num_pdfs, means.shape[1])
    snet = gnet.to_standard()
    snet.components[0].shift = 5
    log_prior = np.log(np.full(tm.num_pdfs, 1.0 / tm.num_pdfs))

    feats = means[rng.randint(0, tm.num_pdfs, 30)].astype(np.float32)
    feats += rng.randn(*feats.shape).astype(np.float32) * 0.1
    # offline: standard net end to end (TimeShift applies inside)
    y, _ = snet.propagate(params, jnp.asarray(feats)[None], logits=True)
    ll = np.asarray(jax.nn.log_softmax(y[0], -1), np.float64) - log_prior
    ref = decode_faster(graph, ll, 0.5, beam=200.0)

    rec = OnlineRecognizer(snet, params, graph, log_prior=log_prior,
                           acoustic_scale=0.5, beam=200.0)
    assert rec.shift.k == 5
    for chunk in _chunks(feats, rng):
        rec.accept(chunk)
    res = rec.finalize()
    assert res.words == ref.words
    assert abs(res.score - ref.score) < 1e-3


def test_online_rejects_bidirectional():
    proto = """<NnetProto>
<BLstmProjectedStreams> <InputDim> 8 <OutputDim> 16 <CellDim> 12 <ParamScale> 0.05 <NumStream> 1
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    lex, lm, tm, means, rng = _oracle_setup(num_words=4, seed=31)
    graph = build_decoding_graph(tm, lex, lm)
    with pytest.raises(ValueError, match="stream"):
        OnlineRecognizer(nnet, params, graph)


def test_native_stream_session_matches_python(monkeypatch):
    """The persistent native search session (kltdecode.cc klt_stream_*)
    must be bit-identical to the numpy OnlineDecoder across chunked
    feeding, including mid-stream partial() hypotheses."""
    from kaldi_lstm_tpu.decode.online import OnlineDecoder
    from kaldi_lstm_tpu.io.native import get_lib
    if get_lib() is None or not hasattr(get_lib(), "klt_stream_new"):
        pytest.skip("native lib unavailable")
    lex, lm, tm, means, rng = _oracle_setup(num_words=5, seed=41)
    graph = build_decoding_graph(tm, lex, lm)
    T = 40
    ll = (means[rng.randint(0, tm.num_pdfs, T)]
          + 0.8 * rng.randn(T, means.shape[1])).astype(np.float64)
    # emission loglik proxy: negative sq distance to class means
    ll = -((ll[:, None, :] - means[None]) ** 2).sum(-1)

    dec_native = OnlineDecoder(graph, acoustic_scale=0.3, beam=14.0,
                               max_active=300)
    assert dec_native._native is not None, "native session must engage"
    monkeypatch.setenv("KLT_DECODE_IMPL", "python")
    dec_py = OnlineDecoder(graph, acoustic_scale=0.3, beam=14.0,
                           max_active=300)
    assert dec_py._native is None
    t = 0
    while t < T:
        n = int(rng.randint(1, 9))
        chunk = ll[t:t + n]
        t += len(chunk)
        dec_native.advance(chunk)
        dec_py.advance(chunk)
        pn, pp = dec_native.partial(), dec_py.partial()
        assert pn.words == pp.words
        np.testing.assert_allclose(pn.score, pp.score, rtol=1e-12)
    rn, rp = dec_native.finalize(), dec_py.finalize()
    assert rn.words == rp.words
    assert rn.reached_final == rp.reached_final
    np.testing.assert_allclose(rn.score, rp.score, rtol=1e-12)
    # full backpointer history identical
    assert len(dec_native.bps) == len(dec_py.bps)
    for a, b in zip(dec_native.bps, dec_py.bps):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
