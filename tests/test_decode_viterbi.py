"""Phone-loop Viterbi decoder + WER scoring: exact recovery on peaked
likelihoods (including same-phone repetition), edit-distance counts,
and the CLI pipeline end to end."""

import numpy as np

from kaldi_lstm_tpu.decode import (
    PhoneLoopGraph,
    edit_distance,
    viterbi_decode,
    wer_report,
)
from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter
from kaldi_lstm_tpu.io.transition_model import \
    make_monophone_transition_model

P, SPS = 4, 3  # phones, states/phone


def expand(phone_seq, frames_per_state=2):
    """True pdf sequence for a phone sequence under the linear topology."""
    pdfs = []
    for ph in phone_seq:
        for s in range(SPS):
            pdfs += [(ph - 1) * SPS + s] * frames_per_state
    return pdfs


def peaked_loglik(pdfs, num_pdfs, peak=5.0):
    T = len(pdfs)
    ll = np.zeros((T, num_pdfs), np.float32)
    ll[np.arange(T), pdfs] = peak
    return ll


def test_viterbi_recovers_sequence():
    tm = make_monophone_transition_model(P, SPS)
    graph = PhoneLoopGraph.from_transition_model(tm)
    seq = [1, 3, 2, 4, 1]
    ll = peaked_loglik(expand(seq), tm.num_pdfs)
    hyp, logp = viterbi_decode(graph, ll)
    assert hyp == seq
    assert np.isfinite(logp)


def test_viterbi_same_phone_repetition():
    tm = make_monophone_transition_model(P, SPS)
    graph = PhoneLoopGraph.from_transition_model(tm)
    seq = [2, 2, 3]
    ll = peaked_loglik(expand(seq), tm.num_pdfs)
    hyp, _ = viterbi_decode(graph, ll)
    assert hyp == seq


def test_viterbi_noisy_and_scale():
    rng = np.random.RandomState(0)
    tm = make_monophone_transition_model(P, SPS)
    graph = PhoneLoopGraph.from_transition_model(tm)
    seq = [4, 1, 2]
    ll = peaked_loglik(expand(seq, 3), tm.num_pdfs, peak=4.0)
    ll += rng.randn(*ll.shape).astype(np.float32) * 0.5
    hyp, _ = viterbi_decode(graph, ll, acoustic_scale=1.0)
    assert hyp == seq


def test_edit_distance_counts():
    s = edit_distance("abcd", "abcd")
    assert (s.errors, s.ins, s.dele, s.sub) == (0, 0, 0, 0)
    s = edit_distance("abcd", "abxd")
    assert (s.errors, s.sub) == (1, 1)
    s = edit_distance("abcd", "abd")
    assert (s.errors, s.dele) == (1, 1)
    s = edit_distance("abcd", "abxcd")
    assert (s.errors, s.ins) == (1, 1)
    s = edit_distance("kitten", "sitting")
    assert s.errors == 3
    assert "%WER 50.00 [ 3 / 6" in wer_report(edit_distance("kitten",
                                                            "sitting"))


def test_cli_pipeline(tmp_path, capsys):
    from kaldi_lstm_tpu.tools.compute_wer import main as wer_main
    from kaldi_lstm_tpu.tools.decode_viterbi import main as dec_main

    tm = make_monophone_transition_model(P, SPS)
    mdl = tmp_path / "final.mdl"
    tm.dump(str(mdl))

    seqs = {"utt1": [1, 2], "utt2": [3, 1, 4], "utt3": [2, 2]}
    with MatrixWriter(f"ark:{tmp_path}/ll.ark") as w:
        for k, seq in seqs.items():
            w.write(k, peaked_loglik(expand(seq), tm.num_pdfs))
    with open(tmp_path / "ref.txt", "w") as f:
        for k, seq in seqs.items():
            f.write(k + " " + " ".join(map(str, seq)) + "\n")

    assert dec_main([str(mdl), f"ark:{tmp_path}/ll.ark",
                     f"ark,t:{tmp_path}/hyp.txt"]) == 0
    assert wer_main([str(tmp_path / "ref.txt"),
                     str(tmp_path / "hyp.txt")]) == 0
    out = capsys.readouterr().out
    assert "%WER 0.00 [ 0 / 7" in out
    assert "%SER 0.00" in out
