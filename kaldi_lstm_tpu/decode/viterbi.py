"""WFST-free Viterbi decoder over a phone-loop built from a
TransitionModel.

The reference defers decoding to upstream Kaldi's decode stack
(`nnet-forward | latgen-faster-mapped`, README.md:17-30); this module
supplies a self-contained equivalent for end-to-end WER/PER measurement:
a phone-loop graph (every phone HMM in parallel, uniform loop-back) and
exact max-product Viterbi over the scaled log-likelihoods that
tools/nnet_forward.py emits (log-posterior minus log-prior, SURVEY.md
§3.2). No lexicon/LM — hypotheses are phone sequences, which is what a
synthetic-task PER needs; a real-word WER still requires an external
WFST decoder.

Decoding is host-side numpy (like Kaldi's decoder): the per-utterance
[T, Ns] dynamic program is tiny next to the AM scoring, and utterance
lengths vary too much to jit usefully.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from kaldi_lstm_tpu.io.transition_model import TransitionModel

NEG = -1e30


@dataclass
class PhoneLoopGraph:
    """Dense phone-loop decoding graph.

    One graph state per (phone, emitting hmm-state) tuple of the
    transition model; state i emits pdf `state_pdf[i]`. Within-phone arcs
    come from the topology; reaching a phone's final (non-emitting) state
    loops back to every phone's entry state with log(1/num_phones) plus
    `phone_insertion_penalty`. Same-phone repetitions are exact whenever
    the entry state cannot be re-entered from within the phone (true for
    Bakis topologies with >= 2 emitting states; a 1-state phone's
    repetition merges with its self-loop).
    """

    logA: np.ndarray        # [Ns, Ns] arc log-probs (NEG = no arc)
    start_logp: np.ndarray  # [Ns]
    final_logp: np.ndarray  # [Ns]
    state_pdf: np.ndarray   # [Ns] emitting pdf per state
    state_phone: np.ndarray  # [Ns]
    is_entry: np.ndarray    # [Ns] bool: phone entry state

    @classmethod
    def from_transition_model(cls, tm: TransitionModel,
                              phone_insertion_penalty: float = 0.0
                              ) -> "PhoneLoopGraph":
        ns = len(tm.tuples)
        # this graph scores every frame of a state with ONE pdf; that is
        # exact for <Triples>-era models (self_loop_pdf == forward_pdf)
        # but not for chain-style <Tuples> models with split pdfs — use
        # decode_faster/latgen/align (per-arc transition-id graphs) there
        for p, s, fwd, slf in tm.tuples:
            if slf != fwd:
                raise ValueError(
                    "phone-loop Viterbi needs self_loop_pdf == "
                    f"forward_pdf; phone {p} state {s} has {fwd} vs "
                    f"{slf} — decode with decode_faster/latgen instead")
        index = {(p, s): i for i, (p, s, _f, _l) in enumerate(tm.tuples)}
        logA = np.full((ns, ns), NEG, np.float64)
        final_logp = np.full(ns, NEG, np.float64)
        state_pdf = np.zeros(ns, np.int32)
        state_phone = np.zeros(ns, np.int32)
        is_entry = np.zeros(ns, bool)

        phones = sorted({p for p, *_ in tm.tuples})
        loop_logp = -np.log(len(phones)) - phone_insertion_penalty
        entries = []
        for phone in phones:
            # entry state = lowest emitting hmm-state of the phone
            s0 = min(s for p, s, _f, _l in tm.tuples if p == phone)
            entries.append(index[(phone, s0)])

        for i, (phone, hmm_state, fwd, _slf) in enumerate(tm.tuples):
            state_pdf[i] = fwd
            state_phone[i] = phone
            topo_state = tm.topo.entry_for_phone(phone)[hmm_state]
            for dst, prob in topo_state.transitions:
                logp = np.log(max(prob, 1e-20))
                if (phone, dst) in index:
                    j = index[(phone, dst)]
                    # merged parallel arcs keep the best (max-product
                    # Viterbi semantics)
                    logA[i, j] = max(logA[i, j], logp)
                else:
                    # arc into the non-emitting final state: utterance may
                    # end here, or loop back to any phone's entry
                    final_logp[i] = max(final_logp[i], logp)
                    for e in entries:
                        logA[i, e] = max(logA[i, e], logp + loop_logp)
        start_logp = np.full(ns, NEG, np.float64)
        for e in entries:
            start_logp[e] = loop_logp  # uniform + penalty, like loop-back
            is_entry[e] = True
        return cls(logA, start_logp, final_logp, state_pdf, state_phone,
                   is_entry)


def viterbi_decode(graph: PhoneLoopGraph, loglik: np.ndarray,
                   acoustic_scale: float = 1.0
                   ) -> tuple[list[int], float]:
    """Exact Viterbi over [T, num_pdfs] log-likelihoods.

    Returns (phone sequence, total log-prob). A new phone token starts at
    t=0 and whenever the best path enters a phone-entry state from a
    different state (loop-back or cross-phone arc).
    """
    T = loglik.shape[0]
    em = acoustic_scale * loglik[:, graph.state_pdf]   # [T, Ns]
    alpha = graph.start_logp + em[0]
    ns = alpha.shape[0]
    bp = np.zeros((T, ns), np.int32)
    for t in range(1, T):
        scores = alpha[:, None] + graph.logA           # [Ns, Ns]
        bp[t] = np.argmax(scores, axis=0)
        alpha = scores[bp[t], np.arange(ns)] + em[t]
    alpha_final = alpha + graph.final_logp
    best_end = int(np.argmax(alpha_final))
    total = float(alpha_final[best_end])

    states = np.zeros(T, np.int32)
    states[T - 1] = best_end
    for t in range(T - 1, 0, -1):
        states[t - 1] = bp[t, states[t]]

    phones = [int(graph.state_phone[states[0]])]
    for t in range(1, T):
        s = states[t]
        if graph.is_entry[s] and states[t - 1] != s:
            phones.append(int(graph.state_phone[s]))
    return phones, total
