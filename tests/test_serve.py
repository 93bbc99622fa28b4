"""Sticky-session serving (VERDICT r4 item 3): heterogeneous chunk
arrival over slot-bound batched scoring must produce hypotheses
IDENTICAL to offline decoding per session, under a Poisson arrival
trace with more sessions than slots; endpointing finalizes on trailing
silence."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Corpus (with intra-utterance silence), trained AM, decode graph,
    per-utterance features and offline-reference hypotheses."""
    from kaldi_lstm_tpu.decode.faster import decode_faster
    from kaldi_lstm_tpu.decode.graph import build_graph_from_arpa
    from kaldi_lstm_tpu.decode.scoring import (
        AmScorer,
        log_priors_from_counts,
        read_class_frame_counts,
    )
    from kaldi_lstm_tpu.io.kaldi_io import (
        SequentialIntVectorReader,
        SequentialMatrixReader,
    )
    from kaldi_lstm_tpu.io.lang import SymbolTable, read_lexicon
    from kaldi_lstm_tpu.io.transition_model import TransitionModel
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.ali_to_pdf import main as ali_to_pdf
    from kaldi_lstm_tpu.tools.ali_to_post import main as ali_to_post
    from kaldi_lstm_tpu.tools.compute_class_counts import main as counts
    from kaldi_lstm_tpu.tools.make_word_synth_data import main as mksynth
    from kaldi_lstm_tpu.tools.train_lstm_streams import main as train

    d = str(tmp_path_factory.mktemp("serve"))
    assert mksynth(["--dir", d, "--num-words", "6", "--num-phones", "5",
                    "--states-per-phone", "2", "--feat-dim", "8",
                    "--num-utts", "50", "--min-pron", "2",
                    "--max-pron", "3", "--max-words", "5",
                    "--sil-prob", "0.4",
                    "--emission-noise", "0.4"]) == 0
    num_pdfs = 10
    assert ali_to_pdf([f"{d}/final.mdl", f"ark:{d}/ali.ark",
                       f"ark:{d}/pdf_ali.ark"]) == 0
    assert ali_to_post([f"ark:{d}/pdf_ali.ark", f"ark:{d}/post.ark"]) == 0
    proto = f"""<NnetProto>
<LstmProjectedStreams> <InputDim> 8 <OutputDim> 12 <CellDim> 16 <ParamScale> 0.08 <NumStream> 8
<AffineTransform> <InputDim> 12 <OutputDim> {num_pdfs} <ParamStddev> 0.1
<Softmax> <InputDim> {num_pdfs} <OutputDim> {num_pdfs}
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    nnet.write(f"{d}/nnet.iter0", params, binary=True)
    for i in range(2):
        assert train([f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
                      f"{d}/nnet.iter{i}", f"{d}/nnet.iter{i+1}",
                      "--learn-rate=5e-3", "--num-stream=8",
                      "--targets-delay=0"]) == 0
    assert counts([f"ark:{d}/post.ark", f"{d}/counts.vec",
                   "--num-classes", str(num_pdfs),
                   "--counts-offset", "1"]) == 0

    nnet, params = Nnet.read(f"{d}/nnet.iter2")
    tm = TransitionModel.load(f"{d}/final.mdl")
    words = SymbolTable.load(f"{d}/words.txt")
    graph = build_graph_from_arpa(tm, read_lexicon(f"{d}/lexicon.txt"),
                                  f"{d}/lm.arpa", words=words)
    log_prior = log_priors_from_counts(
        read_class_frame_counts(f"{d}/counts.vec"))

    feats = dict(SequentialMatrixReader(f"scp:{d}/feats.scp"))

    # silence pdfs, empirically from the alignments (phone 1 = <sil>)
    sil_pdfs = set()
    for _, tids in SequentialIntVectorReader(f"ark:{d}/ali.ark"):
        ph = tm.transition_ids_to_phones(tids)
        pd = tm.transition_ids_to_pdfs(tids)
        sil_pdfs.update(int(p) for p in pd[ph == 1])
    assert sil_pdfs and len(sil_pdfs) < num_pdfs

    # offline reference: batch scoring + offline decoder per utterance
    scorer = AmScorer(nnet, params, log_prior=log_prior, apply_log=True)
    loglik = {k: y for k, y in scorer.score_stream(feats.items())}
    offline = {k: tuple(decode_faster(graph, y, 1.0, 18.0, 0).words)
               for k, y in loglik.items()}

    return dict(nnet=nnet, params=params, graph=graph,
                log_prior=log_prior, feats=feats, loglik=loglik,
                offline=offline, sil_pdfs=frozenset(sil_pdfs),
                decode_faster=decode_faster)


def _server(w, n_slots, **kw):
    from kaldi_lstm_tpu.decode.serve import StickySessionServer
    return StickySessionServer(
        w["nnet"], w["params"], w["graph"], n_slots,
        log_prior=w["log_prior"], acoustic_scale=1.0, beam=18.0,
        chunk_frames=7, **kw)


def test_poisson_trace_matches_offline(world):
    """20 sessions, 6 slots, Poisson chunk sizes with random
    interleaving (some ticks starve some slots): every finalized
    hypothesis equals the offline decode of that utterance."""
    w = world
    srv = _server(w, n_slots=6)
    keys = list(w["feats"])[:20]
    rng = np.random.RandomState(7)
    cursors = {k: 0 for k in keys}
    live = list(keys)
    while live or any(s is not None for s in srv.slots) or srv.waiting:
        for k in list(live):
            if rng.rand() < 0.6:
                n = rng.poisson(6)
                f = w["feats"][k]
                if n > 0 and cursors[k] < len(f):
                    srv.submit(k, f[cursors[k]:cursors[k] + n])
                    cursors[k] += n
                if cursors[k] >= len(f):
                    srv.submit(k, f[0:0])  # ensure session exists
                    srv.end_stream(k)
                    live.remove(k)
        srv.tick()
    srv.drain()
    got = {r.sid: tuple(r.result.words) for r in srv.results}
    assert set(got) == set(keys)
    for k in keys:
        assert got[k] == w["offline"][k], k
    assert not any(r.endpointed for r in srv.results)
    assert 0.0 < srv.occupancy <= 1.0


def test_starved_slot_state_freezes(world):
    """A slot with no pending audio on some ticks must not have its
    LSTM state advanced (idle ticks are invisible to the result)."""
    w = world
    srv = _server(w, n_slots=2)
    k = list(w["feats"])[0]
    f = w["feats"][k]
    srv.submit(k, f[:5])
    srv.tick()   # consumes 5 frames
    srv.tick()   # starved tick: state must freeze
    srv.tick()
    srv.submit(k, f[5:])
    srv.end_stream(k)
    srv.drain()
    assert tuple(srv.results[0].result.words) == w["offline"][k]


def test_endpointing_trailing_silence(world):
    """Speech followed by sustained silence frames endpoints the
    session; the finalized hypothesis equals offline decode of exactly
    the consumed frames."""
    from kaldi_lstm_tpu.decode.serve import EndpointConfig
    w = world
    # a frame the model scores as silence, tiled as the trailing tail
    k = list(w["feats"])[1]
    y = w["loglik"][k]
    sil_frames = [t for t in range(len(y))
                  if int(y[t].argmax()) in w["sil_pdfs"]]
    assert sil_frames, "corpus produced no silence-argmax frame"
    tail = np.tile(w["feats"][k][sil_frames[len(sil_frames) // 2]],
                   (60, 1))
    audio = np.concatenate([w["feats"][k], tail], axis=0)

    srv = _server(w, n_slots=1,
                  endpoint=EndpointConfig(silence_pdfs=w["sil_pdfs"],
                                          trailing_silence_frames=25,
                                          min_speech_frames=3))
    srv.submit(k, audio)
    srv.end_stream(k)
    srv.drain()
    [r] = srv.results
    assert r.endpointed
    assert r.n_frames < len(audio)   # finalized before the audio ran out
    # exactness: result == offline decode of the consumed prefix
    pref = np.asarray(w["loglik"][k])
    from kaldi_lstm_tpu.decode.scoring import AmScorer
    sc = AmScorer(w["nnet"], w["params"], log_prior=w["log_prior"],
                  apply_log=True)
    [(_, ll)] = list(sc.score_stream([(k, audio[:r.n_frames])]))
    ref = w["decode_faster"](w["graph"], ll, 1.0, 18.0, 0)
    assert tuple(r.result.words) == tuple(ref.words)


def test_max_utterance_force_endpoint(world):
    from kaldi_lstm_tpu.decode.serve import EndpointConfig
    w = world
    k = list(w["feats"])[2]
    f = w["feats"][k]
    srv = _server(w, n_slots=1,
                  endpoint=EndpointConfig(silence_pdfs=w["sil_pdfs"],
                                          trailing_silence_frames=10**9,
                                          max_utterance_frames=12))
    srv.submit(k, f)
    srv.end_stream(k)
    srv.drain()
    [r] = srv.results
    assert r.endpointed and 12 <= r.n_frames < len(f)


def test_slot_rebind_after_endpoint(world):
    """An endpointed session's slot rebinds to a waiting session within
    the tick loop; the newcomer still matches offline."""
    from kaldi_lstm_tpu.decode.serve import EndpointConfig
    w = world
    keys = list(w["feats"])[:3]
    srv = _server(w, n_slots=1,
                  endpoint=EndpointConfig(silence_pdfs=w["sil_pdfs"],
                                          trailing_silence_frames=10**9,
                                          max_utterance_frames=8))
    for k in keys:
        srv.submit(k, w["feats"][k])
        srv.end_stream(k)
    srv.drain()
    assert [r.sid for r in srv.results] == keys
    assert all(r.endpointed for r in srv.results)


def test_end_stream_unknown_sid_graceful(world):
    """end_stream for a never-submitted sid must not crash the serving
    loop (review finding: dropped/reordered first chunk)."""
    srv = _server(world, n_slots=1)
    srv.end_stream("never-submitted")   # no KeyError
    srv.drain()
    assert srv.results == []


def test_topp_requires_log_domain():
    """AmScorer rejects top_p in probability domain (review finding:
    the ranking and the floor are only correct on log-likelihoods)."""
    import jax

    from kaldi_lstm_tpu.decode.scoring import AmScorer
    from kaldi_lstm_tpu.models import Nnet
    proto = """<NnetProto>
<AffineTransform> <InputDim> 4 <OutputDim> 5 <ParamStddev> 0.1
<Softmax> <InputDim> 5 <OutputDim> 5
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="log-domain"):
        AmScorer(nnet, params, top_p=2)
    AmScorer(nnet, params, top_p=2, apply_log=True)  # fine


def test_late_audio_after_endpoint_dropped(world):
    from kaldi_lstm_tpu.decode.serve import EndpointConfig
    w = world
    k = list(w["feats"])[3]
    f = w["feats"][k]
    srv = _server(w, n_slots=1,
                  endpoint=EndpointConfig(silence_pdfs=w["sil_pdfs"],
                                          trailing_silence_frames=10**9,
                                          max_utterance_frames=6))
    srv.submit(k, f)
    srv.drain()
    assert len(srv.results) == 1
    srv.submit(k, f)         # late audio: silently dropped
    srv.end_stream(k)        # idempotent on a closed session
    srv.drain()
    assert len(srv.results) == 1