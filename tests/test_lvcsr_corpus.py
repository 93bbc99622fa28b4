"""LVCSR-scale corpus machinery (VERDICT r4 #5): counted-trigram ARPA
generation + sparse word process + speaker-variation wav rendering."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from kaldi_lstm_tpu.tools.make_word_synth_data import main as mk
    d = str(tmp_path_factory.mktemp("tri"))
    assert mk(["--dir", d, "--num-words", "300", "--num-phones", "20",
               "--states-per-phone", "2", "--num-utts", "25",
               "--feat-dim", "8", "--lm-order", "3", "--lm-branch", "6",
               "--lm-train-sents", "2500", "--min-pron", "3",
               "--max-pron", "5", "--emission-noise", "0.3"]) == 0
    return d


def test_counted_arpa_valid_and_normalized(corpus):
    """The written trigram loads through ArpaLM and every history's
    explicit probabilities sum to < 1 (backoff mass reserved)."""
    import math

    from kaldi_lstm_tpu.io.arpa import ArpaLM
    lm = ArpaLM.load(f"{corpus}/lm.arpa")
    assert lm.order == 3
    assert len(lm.ngrams[3]) > 100
    by_hist = {}
    for (a, b), (lp, _bo) in lm.ngrams[2].items():
        by_hist.setdefault(a, 0.0)
        by_hist[a] += math.exp(lp)
    for h, s in by_hist.items():
        assert s < 1.0 + 1e-6, (h, s)
    # unigrams cover the vocab + </s>
    assert len(lm.ngrams[1]) == 300 + 2  # words + </s> + <s>


def test_trigram_graph_oracle_decode(corpus):
    """The n-gram history-expanded graph built from the counted ARPA
    decodes oracle log-likelihoods back to the transcripts."""
    from kaldi_lstm_tpu.decode.faster import decode_faster
    from kaldi_lstm_tpu.decode.graph import build_graph_from_arpa
    from kaldi_lstm_tpu.decode.wer import edit_distance
    from kaldi_lstm_tpu.io.kaldi_io import SequentialIntVectorReader
    from kaldi_lstm_tpu.io.lang import SymbolTable, read_lexicon
    from kaldi_lstm_tpu.io.transition_model import TransitionModel
    d = corpus
    tm = TransitionModel.load(f"{d}/final.mdl")
    graph = build_graph_from_arpa(
        tm, read_lexicon(f"{d}/lexicon.txt"), f"{d}/lm.arpa",
        words=SymbolTable.load(f"{d}/words.txt"))
    text = {ln.split()[0]: ln.split()[1:] for ln in open(f"{d}/text")}
    errs = tot = 0
    for k, tids in list(SequentialIntVectorReader(f"ark:{d}/ali.ark"))[:8]:
        pdfs = tm.transition_ids_to_pdfs(tids)
        ll = np.full((len(pdfs), tm.num_pdfs), -10.0, np.float32)
        ll[np.arange(len(pdfs)), pdfs] = 0.0
        res = decode_faster(graph, ll, 1.0, 16.0, 0)
        st = edit_distance(text[k],
                           [graph.words.id2sym[i] for i in res.words])
        errs += st.errors
        tot += st.ref_len
    assert tot > 0 and errs / tot < 0.05, (errs, tot)


def test_speaker_variation_wavs(corpus, tmp_path):
    """--num-speakers renders the same pdf profiles through per-speaker
    transforms: utt2spk written, same-speaker renders repeatable,
    different speakers measurably different."""
    import wave

    from kaldi_lstm_tpu.tools.synth_wavs import main as sw
    d = corpus
    w1 = str(tmp_path / "w1")
    assert sw([f"{d}/final.mdl", f"ark:{d}/ali.ark", w1,
               "--num-speakers", "4", "--noise-rms", "0.0"]) == 0
    u2s = dict(ln.split() for ln in open(f"{w1}/utt2spk"))
    assert len(set(u2s.values())) == 4

    def read(p):
        w = wave.open(p)
        return np.frombuffer(w.readframes(w.getnframes()), np.int16)

    # speakers 0 and 1 render utt 0's alignment differently; rerunning
    # the tool reproduces identical audio (deterministic transforms)
    w2 = str(tmp_path / "w2")
    assert sw([f"{d}/final.mdl", f"ark:{d}/ali.ark", w2,
               "--num-speakers", "4", "--noise-rms", "0.0"]) == 0
    a = read(f"{w1}/utt00000.wav")
    assert np.array_equal(a, read(f"{w2}/utt00000.wav"))
    # per-speaker gain shows up as different rms across utterances of
    # different speakers rendering comparable material
    rms = [float(np.sqrt((read(f"{w1}/utt{i:05d}.wav").astype(
        np.float64) ** 2).mean())) for i in range(8)]
    assert np.std(rms) / np.mean(rms) > 0.05