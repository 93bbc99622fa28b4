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


def test_split_pdf_chain_decode():
    """Chain-style <Tuples> model (self_loop_pdf != forward_pdf) decodes
    exactly with per-arc emissions: occupying a state for d frames
    consumes d-1 self-loop arcs (self pdf) then the forward arc (forward
    pdf) — decode/graph.py's emission convention."""
    from kaldi_lstm_tpu.io.transition_model import \
        make_chain_transition_model

    P = 3
    tm = make_chain_transition_model(P)
    graph = PhoneLoopGraph.from_transition_model(tm)
    seq, dur = [1, 3, 2, 3], 3
    pdfs = []
    for ph in seq:
        fwd, slf = (ph - 1) * 2, (ph - 1) * 2 + 1
        pdfs += [slf] * (dur - 1) + [fwd]
    ll = peaked_loglik(pdfs, tm.num_pdfs)
    hyp, logp = viterbi_decode(graph, ll)
    assert hyp == seq
    # exact score: every frame hits its peak, plus transition mass:
    # per phone (dur-1) self-loops + the exit arc (log 0.5 each), plus
    # one loop-back/start choice of log(1/P) per token
    expect = 5.0 * len(pdfs) + len(pdfs) * np.log(0.5) - len(seq) * np.log(P)
    assert abs(logp - expect) < 1e-6


def test_split_pdf_wrong_order_not_matched():
    """The arc-exact DP distinguishes [self, fwd] from [fwd, self]: a
    per-state (single-pdf) approximation could not."""
    from kaldi_lstm_tpu.io.transition_model import \
        make_chain_transition_model

    tm = make_chain_transition_model(2)
    graph = PhoneLoopGraph.from_transition_model(tm)
    good = peaked_loglik([1, 1, 0], tm.num_pdfs)   # self,self,fwd of ph1
    bad = peaked_loglik([0, 1, 1], tm.num_pdfs)    # fwd first: impossible
    _, lp_good = viterbi_decode(graph, good)
    _, lp_bad = viterbi_decode(graph, bad)
    assert lp_good > lp_bad + 4.0  # bad path misses >= 1 peak


def test_one_state_phone_repetition_tokens():
    """Re-entry of a 1-emitting-state phone (loop-back onto itself) is a
    NEW phone token, distinct from its self-loop — the per-arc DP fixes
    the merge the old per-state graph documented as a limitation."""
    from kaldi_lstm_tpu.io.transition_model import \
        make_chain_transition_model

    tm = make_chain_transition_model(2)
    graph = PhoneLoopGraph.from_transition_model(tm)
    # phone 1 twice, 2 frames each: self(1), fwd(0), self(1), fwd(0)
    ll = peaked_loglik([1, 0, 1, 0], tm.num_pdfs)
    hyp, _ = viterbi_decode(graph, ll)
    assert hyp == [1, 1]


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
