"""Batched streaming serving CLI: hypotheses must be IDENTICAL to the
offline pipeline (nnet_forward -> decode_faster) on the same corpus —
state carry across chunks is exact, per-slot resets isolate utterances,
and the target delay reproduces the TimeShift end clamp."""

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve"))
    from kaldi_lstm_tpu.tools.make_word_synth_data import main as mk
    assert mk(["--dir", d, "--num-words", "6", "--num-phones", "5",
               "--states-per-phone", "2", "--feat-dim", "8",
               "--num-utts", "14", "--min-pron", "2", "--max-pron", "3",
               "--max-words", "5", "--emission-noise", "0.3"]) == 0
    from kaldi_lstm_tpu.models import Nnet
    proto = """<NnetProto>
<LstmProjectedStreams> <InputDim> 8 <OutputDim> 16 <CellDim> 24 <ParamScale> 0.1 <NumStream> 1
<AffineTransform> <InputDim> 16 <OutputDim> 10 <ParamStddev> 0.2
<Softmax> <InputDim> 10 <OutputDim> 10
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    nnet.write(f"{d}/nnet.iter0", params, binary=True)
    # a TRAINED (peaked-posterior) model: the top-P serving fetch is
    # specified for that regime, and it sharpens every parity check
    from kaldi_lstm_tpu.tools.ali_to_pdf import main as ali_to_pdf
    from kaldi_lstm_tpu.tools.ali_to_post import main as ali_to_post
    from kaldi_lstm_tpu.tools.train_lstm_streams import main as train
    assert ali_to_pdf([f"{d}/final.mdl", f"ark:{d}/ali.ark",
                       f"ark:{d}/pdf_ali.ark"]) == 0
    assert ali_to_post([f"ark:{d}/pdf_ali.ark",
                        f"ark:{d}/post.ark"]) == 0
    for i in range(4):
        assert train([f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
                      f"{d}/nnet.iter{i}", f"{d}/nnet.iter{i+1}",
                      "--learn-rate=5e-3", "--num-stream=4",
                      "--targets-delay=0"]) == 0
    import shutil
    shutil.copy(f"{d}/nnet.iter4", f"{d}/final.nnet")
    return d


def _offline_hyps(d, delay=0):
    from kaldi_lstm_tpu.tools.decode_faster import main as decode
    from kaldi_lstm_tpu.tools.nnet_forward import main as fwd
    spec = f"scp:{d}/feats.scp"
    if delay:
        # offline reference for the target delay: TimeShift end-clamp
        # applied to the features (what a leading <TimeShift> does)
        from kaldi_lstm_tpu.io.kaldi_io import (
            MatrixWriter,
            SequentialMatrixReader,
        )
        from kaldi_lstm_tpu.tools.online_serve_batch import _shift_feats
        with MatrixWriter(f"ark,scp:{d}/sh.ark,{d}/sh.scp") as w:
            for k, m in SequentialMatrixReader(f"scp:{d}/feats.scp"):
                w.write(k, _shift_feats(np.asarray(m, np.float32),
                                        delay))
        spec = f"scp:{d}/sh.scp"
    fwd_args = [f"{d}/final.nnet", spec,
                f"ark:{d}/loglik.ark", "--apply-log=true"]
    assert fwd(fwd_args) == 0
    assert decode([f"{d}/final.mdl", f"{d}/lexicon.txt", f"{d}/lm.arpa",
                   f"ark:{d}/loglik.ark", f"ark,t:{d}/hyp_off.txt",
                   "--word-symbol-table", f"{d}/words.txt",
                   "--acoustic-scale", "0.7", "--beam", "15"]) == 0
    return dict(line.split(None, 1) if " " in line else (line, "")
                for line in open(f"{d}/hyp_off.txt").read().splitlines())


def _serve_hyps(d, n_sessions, chunk, delay=0, extra=()):
    from kaldi_lstm_tpu.tools.online_serve_batch import main as serve
    args = [f"{d}/final.nnet", f"{d}/final.mdl", f"{d}/lexicon.txt",
            f"{d}/lm.arpa", f"scp:{d}/feats.scp",
            f"ark,t:{d}/hyp_srv.txt",
            "--word-symbol-table", f"{d}/words.txt",
            "--acoustic-scale", "0.7", "--beam", "15",
            "--num-sessions", str(n_sessions),
            "--chunk-frames", str(chunk),
            "--targets-delay", str(delay)] + list(extra)
    assert serve(args) == 0
    return dict(line.split(None, 1) if " " in line else (line, "")
                for line in open(f"{d}/hyp_srv.txt").read().splitlines())


def test_serve_batch_matches_offline(corpus):
    off = _offline_hyps(corpus)
    srv = _serve_hyps(corpus, n_sessions=3, chunk=7)
    assert srv == off and len(srv) == 14


def test_serve_batch_delay_matches_offline(corpus):
    off = _offline_hyps(corpus, delay=2)
    srv = _serve_hyps(corpus, n_sessions=2, chunk=5, delay=2)
    assert srv == off


def test_serve_batch_single_session_and_big_chunk(corpus):
    off = _offline_hyps(corpus)
    srv = _serve_hyps(corpus, n_sessions=1, chunk=1000)
    assert srv == off


def test_serve_batch_with_priors(corpus):
    """--class-frame-counts (log-prior division) parity vs the offline
    nnet_forward path — this flag path had no prior coverage and hid a
    signature bug."""
    d = corpus
    from kaldi_lstm_tpu.tools.compute_class_counts import main as counts
    from kaldi_lstm_tpu.tools.decode_faster import main as decode
    from kaldi_lstm_tpu.tools.nnet_forward import main as fwd
    from kaldi_lstm_tpu.tools.online_serve_batch import main as serve
    assert counts([f"ark:{d}/post.ark", f"{d}/counts.vec",
                   "--num-classes", "10", "--counts-offset", "1"]) == 0
    assert fwd([f"{d}/final.nnet", f"scp:{d}/feats.scp",
                f"ark:{d}/loglik.ark", "--apply-log=true",
                f"--class-frame-counts={d}/counts.vec"]) == 0
    assert decode([f"{d}/final.mdl", f"{d}/lexicon.txt", f"{d}/lm.arpa",
                   f"ark:{d}/loglik.ark", f"ark,t:{d}/hyp_off.txt",
                   "--word-symbol-table", f"{d}/words.txt",
                   "--acoustic-scale", "0.7", "--beam", "15"]) == 0
    off = dict(line.split(None, 1) if " " in line else (line, "")
               for line in open(f"{d}/hyp_off.txt").read().splitlines())
    assert serve([f"{d}/final.nnet", f"{d}/final.mdl",
                  f"{d}/lexicon.txt", f"{d}/lm.arpa",
                  f"scp:{d}/feats.scp", f"ark,t:{d}/hyp_srv.txt",
                  "--word-symbol-table", f"{d}/words.txt",
                  "--acoustic-scale", "0.7", "--beam", "15",
                  "--num-sessions", "3", "--chunk-frames", "6",
                  f"--class-frame-counts={d}/counts.vec"]) == 0
    srv = dict(line.split(None, 1) if " " in line else (line, "")
               for line in open(f"{d}/hyp_srv.txt").read().splitlines())
    assert srv == off


def test_serve_batch_pipelined(corpus):
    """--pipeline (double-buffered dispatch/fetch, lag-by-one slot
    processing) must produce identical hypotheses."""
    off = _offline_hyps(corpus)
    srv = _serve_hyps(corpus, n_sessions=3, chunk=7,
                      extra=["--pipeline", "true"])
    assert srv == off
    srv2 = _serve_hyps(corpus, n_sessions=2, chunk=5, delay=2,
                       extra=["--pipeline", "true"])
    assert srv2 == _offline_hyps(corpus, delay=2)


def test_serve_batch_top_p(corpus):
    """top_p = num_pdfs is exact reconstruction -> identical
    hypotheses; a moderate top_p on this separable task must match
    too (the serving approximation's operating regime)."""
    off = _offline_hyps(corpus)
    srv_full = _serve_hyps(corpus, n_sessions=3, chunk=9,
                           extra=["--top-p", "10"])
    assert srv_full == off
    srv_p = _serve_hyps(corpus, n_sessions=3, chunk=9,
                        extra=["--top-p", "6"])
    assert srv_p == off
