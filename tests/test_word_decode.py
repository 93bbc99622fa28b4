"""Word-level decoding: ARPA LM, HCLG-lite graph, token-passing beam
search. Closes the reference's decode recipe (nnet-forward |
decode-faster-mapped, README.md:17-30) natively at the word level."""

import math
import os

import numpy as np
import pytest

from kaldi_lstm_tpu.decode.faster import decode_faster
from kaldi_lstm_tpu.decode.graph import build_decoding_graph
from kaldi_lstm_tpu.io.arpa import ArpaBigram, uniform_unigram
from kaldi_lstm_tpu.io.lang import SymbolTable, read_lexicon, write_lexicon
from kaldi_lstm_tpu.io.transition_model import \
    make_monophone_transition_model


# ---------------------------------------------------------------------------
# ARPA
# ---------------------------------------------------------------------------

def test_arpa_roundtrip(tmp_path):
    lm = ArpaBigram()
    lm.unigram = {"<s>": (-99.0, math.log(0.5)),
                  "</s>": (math.log(0.2), 0.0),
                  "a": (math.log(0.5), math.log(0.3)),
                  "b": (math.log(0.3), 0.0)}
    lm.bigram = {("<s>", "a"): math.log(0.9),
                 ("a", "b"): math.log(0.6),
                 ("b", "</s>"): math.log(0.7)}
    path = str(tmp_path / "lm.arpa")
    lm.save(path)
    lm2 = ArpaBigram.load(path)
    for w, (lp, bo) in lm.unigram.items():
        lp2, bo2 = lm2.unigram[w]
        assert abs(lp - lp2) < 1e-4 and abs(bo - bo2) < 1e-4
    for k, v in lm.bigram.items():
        assert abs(lm2.bigram[k] - v) < 1e-4


def test_arpa_backoff_logp():
    lm = ArpaBigram()
    lm.unigram = {"a": (math.log(0.5), math.log(0.25)),
                  "b": (math.log(0.5), 0.0)}
    lm.bigram = {("a", "a"): math.log(0.9)}
    assert abs(lm.logp("a", "a") - math.log(0.9)) < 1e-12
    # (a, b) unseen -> backoff(a) + unigram(b)
    assert abs(lm.logp("a", "b") - (math.log(0.25) + math.log(0.5))) \
        < 1e-12
    # P(a|a) * P(a|a) * P(b|a backed-off)
    assert abs(lm.score_sentence(["a", "a"], bos="a", eos="b")
               - (2 * math.log(0.9) + math.log(0.25) + math.log(0.5))) \
        < 1e-12


def test_arpa_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.arpa")
    with open(path, "w") as f:
        f.write("this is not an arpa file\n")
    with pytest.raises(ValueError):
        ArpaBigram.load(path)


# ---------------------------------------------------------------------------
# graph + decoder on oracle likelihoods
# ---------------------------------------------------------------------------

def _oracle_setup(num_words=6, num_phones=8, seed=3, sil_prob=0.0):
    """Tiny language + corpus with well-separated Gaussian emissions."""
    from kaldi_lstm_tpu.tools.make_word_synth_data import make_language, \
        sample_sentence
    rng = np.random.RandomState(seed)
    lex, lm = make_language(rng, num_words, num_phones, 2, 3,
                            eos_prob=0.25)
    tm = make_monophone_transition_model(num_phones, 3,
                                         self_loop_prob=0.5)
    mean_rng = np.random.RandomState(1)
    means = mean_rng.randn(tm.num_pdfs, 16).astype(np.float64) * 2.0
    return lex, lm, tm, means, rng


def _emit(tm, lex, means, rng, sent, noise=0.2, sil_prob=0.0):
    pdfs = []
    def add_phone(ph):
        for s in range(3):
            pdf = (ph - 1) * 3 + s
            pdfs.append(pdf)
            while rng.rand() < 0.5:
                pdfs.append(pdf)
    for w in sent:
        if sil_prob > 0 and rng.rand() < sil_prob:
            add_phone(1)
        for ph in lex[w][0]:
            add_phone(ph)
    feats = means[pdfs] + rng.randn(len(pdfs), means.shape[1]) * noise
    # oracle per-pdf log-likelihoods (shared constants dropped)
    d2 = ((feats[:, None, :] - means[None, :, :]) ** 2).sum(-1)
    return -0.5 * d2 / noise ** 2


def test_word_decode_oracle_exact():
    lex, lm, tm, means, rng = _oracle_setup()
    graph = build_decoding_graph(tm, lex, lm)
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    errs = total = 0
    for _ in range(10):
        sent = sample_sentence(rng, lm, sorted(lex), 8) or ["w000"]
        loglik = _emit(tm, lex, means, rng, sent)
        res = decode_faster(graph, loglik, acoustic_scale=1.0, beam=20.0)
        hyp = [graph.words.id2sym[i] for i in res.words]
        assert res.reached_final
        total += len(sent)
        if hyp != sent:
            errs += 1
    # oracle acoustics, exact-coverage bigram LM: everything decodes
    assert errs == 0, f"{errs} sentence errors"


def test_word_decode_with_optional_silence():
    lex, lm, tm, means, rng = _oracle_setup()
    graph = build_decoding_graph(tm, lex, lm, sil_phone=1, sil_prob=0.3)
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    for _ in range(5):
        sent = sample_sentence(rng, lm, sorted(lex), 6) or ["w000"]
        loglik = _emit(tm, lex, means, rng, sent, sil_prob=0.5)
        res = decode_faster(graph, loglik, acoustic_scale=1.0, beam=20.0)
        hyp = [graph.words.id2sym[i] for i in res.words]
        assert hyp == sent


def test_word_decode_unigram_grammar():
    lex, lm, tm, means, rng = _oracle_setup()
    uni = uniform_unigram(sorted(lex))
    graph = build_decoding_graph(tm, lex, uni)
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    sent = sample_sentence(rng, lm, sorted(lex), 6) or ["w000"]
    loglik = _emit(tm, lex, means, rng, sent)
    res = decode_faster(graph, loglik, acoustic_scale=1.0, beam=20.0)
    assert [graph.words.id2sym[i] for i in res.words] == sent


def test_lm_breaks_acoustic_tie():
    """Two words share a pronunciation; the LM must pick the likelier."""
    lex = {"hi": [[2, 3]], "lo": [[2, 3]]}
    lm = ArpaBigram()
    lm.unigram = {"hi": (math.log(0.9), 0.0),
                  "lo": (math.log(0.05), 0.0),
                  "</s>": (math.log(0.05), 0.0)}
    tm = make_monophone_transition_model(3, 3, self_loop_prob=0.5)
    rng = np.random.RandomState(0)
    means = np.random.RandomState(1).randn(tm.num_pdfs, 8) * 2.0
    loglik = _emit(tm, lex, means, rng, ["hi"])
    graph = build_decoding_graph(tm, lex, lm)
    res = decode_faster(graph, loglik, acoustic_scale=1.0, beam=25.0)
    assert [graph.words.id2sym[i] for i in res.words] == ["hi"]


def test_max_active_pruning_still_decodes():
    lex, lm, tm, means, rng = _oracle_setup()
    graph = build_decoding_graph(tm, lex, lm)
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    sent = sample_sentence(rng, lm, sorted(lex), 6) or ["w000"]
    loglik = _emit(tm, lex, means, rng, sent)
    res = decode_faster(graph, loglik, acoustic_scale=1.0, beam=20.0,
                        max_active=24)
    assert [graph.words.id2sym[i] for i in res.words] == sent


def test_graph_rejects_lm_word_missing_from_lexicon():
    lex = {"a": [[2]]}
    lm = ArpaBigram()
    lm.unigram = {"a": (math.log(0.5), 0.0), "b": (math.log(0.5), 0.0)}
    tm = make_monophone_transition_model(3, 3)
    with pytest.raises(ValueError, match="missing from lexicon"):
        build_decoding_graph(tm, lex, lm)


# ---------------------------------------------------------------------------
# language resources
# ---------------------------------------------------------------------------

def test_symbol_table_and_lexicon_roundtrip(tmp_path):
    t = SymbolTable()
    t.add("<eps>", 0)
    t.add("foo")
    t.add("bar")
    path = str(tmp_path / "words.txt")
    t.save(path)
    t2 = SymbolTable.load(path)
    assert t2.sym2id == t.sym2id
    lex = {"foo": [[1, 2], [3]], "bar": [[2]]}
    lpath = str(tmp_path / "lexicon.txt")
    write_lexicon(lpath, lex)
    assert read_lexicon(lpath) == lex


# ---------------------------------------------------------------------------
# full CLI pipeline: corpus -> oracle loglik ark -> decode_faster -> WER
# ---------------------------------------------------------------------------

def test_decode_faster_cli_pipeline(tmp_path, capsys):
    from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter, \
        SequentialMatrixReader
    from kaldi_lstm_tpu.io.transition_model import TransitionModel
    from kaldi_lstm_tpu.tools import compute_wer, decode_faster as dftool, \
        make_word_synth_data
    d = str(tmp_path)
    assert make_word_synth_data.main(
        ["--dir", d, "--num-words", "6", "--num-phones", "8",
         "--num-utts", "12", "--feat-dim", "16",
         "--emission-noise", "0.25", "--max-words", "6"]) == 0
    # oracle likelihoods from the generator's own means
    tm = TransitionModel.load(f"{d}/final.mdl")
    means = np.random.RandomState(42).randn(tm.num_pdfs, 16)
    with MatrixWriter(f"ark:{d}/loglik.ark") as w:
        for key, feats in SequentialMatrixReader(f"scp:{d}/feats.scp"):
            d2 = ((feats[:, None, :].astype(np.float64)
                   - means[None, :, :]) ** 2).sum(-1)
            w.write(key, (-0.5 * d2 / 0.25 ** 2).astype(np.float32))
    assert dftool.main(
        [f"{d}/final.mdl", f"{d}/lexicon.txt", f"{d}/lm.arpa",
         f"ark:{d}/loglik.ark", f"ark,t:{d}/hyp.txt",
         "--word-symbol-table", f"{d}/words.txt",
         "--acoustic-scale", "1.0", "--beam", "20"]) == 0
    assert compute_wer.main([f"{d}/text", f"{d}/hyp.txt"]) == 0
    out = capsys.readouterr().out
    wer = float(out.split("%WER ")[1].split()[0])
    assert wer <= 2.0, out


def test_vectorized_matches_token_decoder():
    """decode_faster (dense scatter-max) vs decode_faster_tokens (hash
    token passing): same score and transcript on real graphs."""
    from kaldi_lstm_tpu.decode.faster import decode_faster_tokens
    lex, lm, tm, means, rng = _oracle_setup(num_words=8, seed=11)
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    for sil in (0.0, 0.3):
        graph = build_decoding_graph(
            tm, lex, lm, sil_phone=1 if sil else 0, sil_prob=sil)
        for _ in range(6):
            sent = sample_sentence(rng, lm, sorted(lex), 7) or ["w000"]
            loglik = _emit(tm, lex, means, rng, sent, noise=0.6,
                           sil_prob=sil)
            a = decode_faster(graph, loglik, 1.0, beam=14.0)
            b = decode_faster_tokens(graph, loglik, 1.0, beam=14.0)
            assert abs(a.score - b.score) < 1e-6
            assert a.words == b.words


def test_native_matches_python_vectorized(monkeypatch):
    """The C++ decoder core (native/kltdecode.cc) is bit-identical to
    the numpy vectorized path: same words AND same float64 scores,
    with and without max_active pruning."""
    from kaldi_lstm_tpu.io.native import get_lib
    import pytest
    lib = get_lib()
    if lib is None or not hasattr(lib, "klt_decode_faster"):
        pytest.skip("native decode core unavailable")
    lex, lm, tm, means, rng = _oracle_setup(num_words=8, seed=23)
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    graph = build_decoding_graph(tm, lex, lm)
    for max_active in (0, 12):
        for _ in range(4):
            sent = sample_sentence(rng, lm, sorted(lex), 7) or ["w000"]
            loglik = _emit(tm, lex, means, rng, sent, noise=0.6)
            monkeypatch.setenv("KLT_DECODE_IMPL", "auto")
            a = decode_faster(graph, loglik, 1.0, beam=14.0,
                              max_active=max_active)
            monkeypatch.setenv("KLT_DECODE_IMPL", "python")
            b = decode_faster(graph, loglik, 1.0, beam=14.0,
                              max_active=max_active)
            assert a.words == b.words
            assert a.score == b.score  # bit-exact, not approx
            assert a.reached_final == b.reached_final


def test_native_lattice_matches_python(monkeypatch):
    """The C++ lattice forward (klt_decode_lattice) yields the exact
    same pruned lattice (states, arcs, costs, finals) as the numpy
    path."""
    from kaldi_lstm_tpu.decode.lattice_faster import decode_lattice_faster
    from kaldi_lstm_tpu.io.native import get_lib
    import pytest
    lib = get_lib()
    if lib is None or not hasattr(lib, "klt_decode_lattice"):
        pytest.skip("native lattice core unavailable")
    lex, lm, tm, means, rng = _oracle_setup(num_words=8, seed=31)
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    graph = build_decoding_graph(tm, lex, lm)

    def sig(lat):
        arcs = []
        for s, al in enumerate(lat.arcs):
            for a in al:
                arcs.append((s, a.ilabel, a.olabel, a.graph_cost,
                             a.acoustic_cost, a.dst))
        return (lat.start, sorted(lat.final.items()), sorted(arcs),
                lat.reached_final)

    for max_active in (0, 12):
        for _ in range(3):
            sent = sample_sentence(rng, lm, sorted(lex), 6) or ["w000"]
            loglik = _emit(tm, lex, means, rng, sent, noise=0.7)
            monkeypatch.setenv("KLT_DECODE_IMPL", "auto")
            a = decode_lattice_faster(graph, loglik, 1.0, beam=14.0,
                                      lattice_beam=5.0,
                                      max_active=max_active)
            monkeypatch.setenv("KLT_DECODE_IMPL", "python")
            b = decode_lattice_faster(graph, loglik, 1.0, beam=14.0,
                                      lattice_beam=5.0,
                                      max_active=max_active)
            assert sig(a) == sig(b)


def test_tight_beam_and_max_active_one_agree(monkeypatch):
    """Degenerate pruning (beam ~0, max_active=1 keeps only the single
    best token per frame) exercises the cutoff edge cases; both
    implementations must still agree bit-exactly."""
    lex, lm, tm, means, rng = _oracle_setup(num_words=6, seed=41)
    graph = build_decoding_graph(tm, lex, lm)
    for _ in range(3):
        loglik = _emit(tm, lex, means, rng, ["w000", "w001"], noise=0.3)
        monkeypatch.setenv("KLT_DECODE_IMPL", "auto")
        a = decode_faster(graph, loglik, 1.0, beam=1e-9, max_active=1)
        monkeypatch.setenv("KLT_DECODE_IMPL", "python")
        b = decode_faster(graph, loglik, 1.0, beam=1e-9, max_active=1)
        assert a.words == b.words and a.score == b.score
