"""Sequence-discriminative (MMI) training, lattice-free over the
phone-loop graph.

The reference's standard variant advertises compatibility with nnet1's
sequence-training tools (standard/README.md:2-6); those depend on
decode-time lattices from upstream Kaldi. The TPU-native re-design
replaces lattices with an exact dense forward pass over the phone-loop
denominator graph (decode/viterbi.py builds it from the transition
model) — the same graph the native decoder searches — computed as a
`lax.scan` of batched log-matrix-vector products. That makes the MMI
objective

    F = log p(X | num path) - log p(X | den graph)

fully differentiable by jax.grad: the gradient w.r.t. the pre-softmax
activations is the classic (numerator − denominator) posterior
difference, with the denominator occupancies produced by autodiff of
the logsumexp recursion (no hand-written backward, mirroring how the
frame-xent trainer gets BPTT for free).

Numerator: the aligned state path's acoustic score plus its transition
log-probs (a fixed alignment, as in Kaldi's MMI recipes where the
numerator lattice is the forced alignment). Acoustic scale applies to
both terms. Padded frames are masked: their emissions contribute 0 and
the recursion carries alpha through unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.decode.viterbi import NEG, PhoneLoopGraph


class DenGraph(NamedTuple):
    """Device-resident denominator graph (from PhoneLoopGraph)."""
    logA: jax.Array        # [Ns, Ns]
    start_logp: jax.Array  # [Ns]
    final_logp: jax.Array  # [Ns]
    state_pdf: jax.Array   # [Ns] int32
    state_phone: jax.Array  # [Ns] int32 (MPE phone accuracy)

    @classmethod
    def from_phone_loop(cls, g: PhoneLoopGraph) -> "DenGraph":
        # the dense den graph scores every frame of a state with ONE pdf;
        # exact for <Triples>-era models only — chain-style <Tuples>
        # models with split self-loop/forward pdfs need per-arc emissions
        # (decode/viterbi.py handles those; sequence training does not)
        if not np.array_equal(np.asarray(g.self_pdf),
                              np.asarray(g.state_pdf)):
            raise ValueError(
                "sequence training's dense denominator graph needs "
                "self_loop_pdf == forward_pdf (<Triples>-era model); "
                "this model has split pdfs")
        return cls(jnp.asarray(g.logA, jnp.float32),
                   jnp.asarray(g.start_logp, jnp.float32),
                   jnp.asarray(g.final_logp, jnp.float32),
                   jnp.asarray(g.state_pdf, jnp.int32),
                   jnp.asarray(g.state_phone, jnp.int32))


class PhoneLoopDenGraph(NamedTuple):
    """Structured phone-loop denominator graph with an O(Ns)-per-frame
    forward — the TPU-scalable replacement for DenGraph's dense
    [Ns, Ns] relaxation (O(Ns^2) per frame is 64M lse terms at 7998
    senones; the structure makes flagship-scale lattice-free
    sequence training cheap).

    Exploits the phone loop's shape: each state has only a self-loop
    (`log_self`), an in-phone successor arc i -> i+1 (`log_fwd`, NEG at
    phone-final states), and an exit (`log_final`) into ONE shared
    non-emitting junction that fans out to every phone entry with
    `loop_logp`. The junction factorizes the all-pairs loop-back block
    of the dense matrix into one logsumexp pool per frame.

    Also slightly MORE exact than DenGraph for 1-emitting-state phones:
    the dense path merges the self-loop and re-entry parallel arcs with
    max (a Viterbi merge), while here they stay separate lse terms.
    """

    log_self: jax.Array    # [Ns]
    log_fwd: jax.Array     # [Ns] arc i -> i+1 (NEG at phone-final)
    log_final: jax.Array   # [Ns] arc into the loop junction / final
    is_entry: jax.Array    # [Ns] bool
    loop_logp: jax.Array   # scalar: junction -> each entry
    state_pdf: jax.Array   # [Ns] int32
    state_phone: jax.Array  # [Ns] int32

    @property
    def start_logp(self) -> jax.Array:
        return jnp.where(self.is_entry, self.loop_logp, NEG)

    @property
    def final_logp(self) -> jax.Array:
        return self.log_final

    @classmethod
    def from_transition_model(cls, tm, phone_insertion_penalty: float = 0.0
                              ) -> "PhoneLoopDenGraph":
        """O(Ns)-memory construction straight from the transition model
        (no dense matrix). Raises ValueError for split-pdf models or
        topologies with skip arcs (fall back to the dense DenGraph)."""
        tuples = tm.tuples
        ns = len(tuples)
        index = {(p, s): i for i, (p, s, _f, _l) in enumerate(tuples)}
        log_self = np.full(ns, NEG)
        log_fwd = np.full(ns, NEG)
        log_final = np.full(ns, NEG)
        state_pdf = np.zeros(ns, np.int32)
        state_phone = np.zeros(ns, np.int32)
        for i, (phone, hmm_state, fwd, slf) in enumerate(tuples):
            if slf != fwd:
                raise ValueError(
                    "phone-loop den graph needs self_loop_pdf == "
                    "forward_pdf (<Triples>-era model)")
            state_pdf[i] = fwd
            state_phone[i] = phone
            topo_state = tm.topo.entry_for_phone(phone)[hmm_state]
            for dst, prob in topo_state.transitions:
                logp = np.log(max(prob, 1e-20))
                if dst == hmm_state:
                    log_self[i] = np.logaddexp(log_self[i], logp)
                elif (phone, dst) in index:
                    if index[(phone, dst)] != i + 1:
                        raise ValueError(
                            "phone-loop den graph needs a strictly "
                            "sequential (no-skip) Bakis topology; use "
                            "the dense DenGraph")
                    log_fwd[i] = np.logaddexp(log_fwd[i], logp)
                else:
                    log_final[i] = np.logaddexp(log_final[i], logp)
        phones = sorted({p for p, *_ in tuples})
        is_entry = np.zeros(ns, bool)
        for phone in phones:
            s0 = min(s for p, s, _f, _l in tuples if p == phone)
            is_entry[index[(phone, s0)]] = True
        loop_logp = -np.log(len(phones)) - phone_insertion_penalty
        return cls(jnp.asarray(log_self, jnp.float32),
                   jnp.asarray(log_fwd, jnp.float32),
                   jnp.asarray(log_final, jnp.float32),
                   jnp.asarray(is_entry),
                   jnp.float32(loop_logp),
                   jnp.asarray(state_pdf, jnp.int32),
                   jnp.asarray(state_phone, jnp.int32))


class SplitDenGraph(NamedTuple):
    """Denominator graph with PER-ARC emissions — chain-style `<Tuples>`
    models whose self-loop pdf differs from the forward pdf (the case
    DenGraph/PhoneLoopDenGraph reject). Mirrors decode/viterbi.py's
    split-arc convention exactly: frame t is scored by the pdf of the
    arc that consumes it — `self_pdf[j]` on state j's self-loop,
    `state_pdf[i]` (the forward pdf of the SOURCE state) on every other
    arc in `logA_enter`, including the final exit arc that consumes the
    last real frame.

    The forward pass is the logsumexp twin of viterbi_decode's DP
    ("alpha[j] = frames consumed so far, frame t to be consumed FROM
    j"): per-batch exit terms are folded in at each utterance's last
    real frame, so trailing padding is handled without a per-utterance
    final gather."""

    logA_enter: jax.Array   # [Ns, Ns] non-self arcs (incl. loop-backs)
    self_logp: jax.Array    # [Ns]
    start_logp: jax.Array   # [Ns]
    final_logp: jax.Array   # [Ns]
    state_pdf: jax.Array    # [Ns] forward pdf
    self_pdf: jax.Array     # [Ns] self-loop pdf
    state_phone: jax.Array  # [Ns]

    @classmethod
    def from_phone_loop(cls, g: PhoneLoopGraph) -> "SplitDenGraph":
        return cls(jnp.asarray(g.logA_enter, jnp.float32),
                   jnp.asarray(g.self_logp, jnp.float32),
                   jnp.asarray(g.start_logp, jnp.float32),
                   jnp.asarray(g.final_logp, jnp.float32),
                   jnp.asarray(g.state_pdf, jnp.int32),
                   jnp.asarray(g.self_pdf, jnp.int32),
                   jnp.asarray(g.state_phone, jnp.int32))


def _split_logZ_from_em(graph: SplitDenGraph, em_fwd: jax.Array,
                        em_self: jax.Array, mask: jax.Array) -> jax.Array:
    """log p(X | den graph) [B] from per-arc emissions em_fwd/em_self
    [B, T, Ns] (padded frames must be 0). Exact lse forward in the
    source-consumed formulation (see SplitDenGraph docstring)."""
    B = em_fwd.shape[0]
    ns = graph.start_logp.shape[0]
    alpha0 = jnp.broadcast_to(graph.start_logp[None], (B, ns))
    # frame t is each utterance's LAST real frame iff m_t=1 and m_{t+1}=0
    m_next = jnp.concatenate([mask[:, 1:], jnp.zeros_like(mask[:, :1])],
                             axis=1)
    is_last = mask * (1.0 - m_next)                          # [B, T]

    def step(carry, inputs):
        alpha, logZ = carry
        em_f, em_s, m_t, last_t = inputs
        exit_term = jax.nn.logsumexp(
            alpha + em_f + graph.final_logp[None], axis=-1)  # [B]
        logZ = jnp.where(last_t > 0,
                         jnp.logaddexp(logZ, exit_term), logZ)
        src = alpha + em_f                                   # leave via fwd
        enter = jax.nn.logsumexp(
            src[:, :, None] + graph.logA_enter[None], axis=1)
        stay = alpha + graph.self_logp[None] + em_s
        nxt = jnp.logaddexp(enter, stay)
        alpha = jnp.where(m_t[:, None] > 0, nxt, alpha)
        return (alpha, logZ), None

    xs = (jnp.swapaxes(em_fwd, 0, 1), jnp.swapaxes(em_self, 0, 1),
          jnp.swapaxes(mask, 0, 1), jnp.swapaxes(is_last, 0, 1))
    (_, logZ), _ = jax.lax.scan(step, (alpha0, jnp.full((B,), NEG)), xs)
    return logZ


def _prepare_em_split(graph: SplitDenGraph, loglik: jax.Array,
                      mask: jax.Array, acoustic_scale: float
                      ) -> tuple[jax.Array, jax.Array]:
    em_fwd = acoustic_scale * loglik[:, :, graph.state_pdf]
    em_self = acoustic_scale * loglik[:, :, graph.self_pdf]
    keep = mask[:, :, None] > 0
    return jnp.where(keep, em_fwd, 0.0), jnp.where(keep, em_self, 0.0)


def _struct_step(graph: PhoneLoopDenGraph, alpha: jax.Array,
                 em_t: jax.Array) -> jax.Array:
    """One O(Ns) lse-forward frame over the structured phone loop."""
    pool = jax.nn.logsumexp(alpha + graph.log_final[None], axis=-1)
    stay = alpha + graph.log_self[None]
    shifted = alpha + graph.log_fwd[None]                    # arc i->i+1
    fwd = jnp.concatenate(
        [jnp.full_like(shifted[:, :1], NEG), shifted[:, :-1]], axis=1)
    enter = jnp.where(graph.is_entry[None],
                      pool[:, None] + graph.loop_logp, NEG)
    return jnp.logaddexp(jnp.logaddexp(stay, fwd), enter) + em_t


def _den_logZ_from_em(graph, em: jax.Array, mask: jax.Array) -> jax.Array:
    """Exact logsumexp forward on prepared per-state emissions em
    [B, T, Ns] (padded frames must be 0 in em); returns
    log p(X | den graph) [B]. Dense [Ns, Ns] relaxation for DenGraph,
    O(Ns) structured recurrence for PhoneLoopDenGraph."""
    structured = isinstance(graph, PhoneLoopDenGraph)
    alpha0 = graph.start_logp[None, :] + em[:, 0]            # [B, Ns]

    def step(alpha, inputs):
        em_t, m_t = inputs                                   # [B,Ns],[B]
        if structured:
            nxt = _struct_step(graph, alpha, em_t)
        else:
            # logsumexp over source states of alpha + logA
            nxt = jax.nn.logsumexp(alpha[:, :, None] + graph.logA[None],
                                   axis=1) + em_t
        alpha = jnp.where(m_t[:, None] > 0, nxt, alpha)
        return alpha, None

    em_rest = jnp.swapaxes(em[:, 1:], 0, 1)                  # [T-1, B, Ns]
    mask_rest = jnp.swapaxes(mask[:, 1:], 0, 1)
    alpha, _ = jax.lax.scan(step, alpha0, (em_rest, mask_rest))
    return jax.nn.logsumexp(alpha + graph.final_logp[None], axis=-1)


def _prepare_em(graph: DenGraph, loglik: jax.Array, mask: jax.Array,
                acoustic_scale: float) -> jax.Array:
    em = acoustic_scale * loglik[:, :, graph.state_pdf]      # [B, T, Ns]
    return jnp.where(mask[:, :, None] > 0, em, 0.0)


def den_logprob(graph: DenGraph, loglik: jax.Array, mask: jax.Array,
                acoustic_scale: float = 1.0) -> jax.Array:
    """log p(X | den graph) for a batch.

    loglik: [B, T, K] acoustic log-likelihoods; mask: [B, T] (1 = real
    frame). Returns [B]. Exact logsumexp forward over the dense graph.
    """
    if isinstance(graph, SplitDenGraph):
        em_f, em_s = _prepare_em_split(graph, loglik, mask,
                                       acoustic_scale)
        return _split_logZ_from_em(graph, em_f, em_s, mask)
    return _den_logZ_from_em(
        graph, _prepare_em(graph, loglik, mask, acoustic_scale), mask)


def num_logprob(graph: DenGraph, loglik: jax.Array, states: jax.Array,
                mask: jax.Array, acoustic_scale: float = 1.0,
                with_transitions: bool = True) -> jax.Array:
    """log p(X, num path): acoustic score of the aligned graph-state path
    plus (optionally) its transition/start/final log-probs.

    states: [B, T] int32 graph-state alignment (from the tuple index of
    the transition model; see alignment_to_states).
    """
    if isinstance(graph, SplitDenGraph):
        return _num_logprob_split(graph, loglik, states, mask,
                                  acoustic_scale, with_transitions)
    B, T = states.shape
    pdfs = graph.state_pdf[states]                           # [B, T]
    ac = acoustic_scale * jnp.take_along_axis(
        loglik, pdfs[..., None], axis=-1)[..., 0]            # [B, T]
    total = jnp.sum(ac * mask, axis=-1)
    if with_transitions:
        lm = graph.start_logp[states[:, 0]]
        if isinstance(graph, PhoneLoopDenGraph):
            prev, cur = states[:, :-1], states[:, 1:]
            stay = cur == prev
            step_fwd = (cur == prev + 1) & (
                graph.state_phone[cur] == graph.state_phone[prev])
            loop = (graph.log_final[prev] + graph.loop_logp
                    + jnp.where(graph.is_entry[cur], 0.0, NEG))
            # a same-state pair on a 1-emitting-state phone is ambiguous
            # (self-loop OR re-entry; the tuple-index path cannot tell):
            # score it max(self, re-entry) — exactly the dense graph's
            # Viterbi-merged diagonal, so both graph types agree
            stay_score = jnp.maximum(graph.log_self[prev], loop)
            trans = jnp.where(stay, stay_score,
                              jnp.where(step_fwd, graph.log_fwd[prev],
                                        loop))                # [B, T-1]
        else:
            trans = graph.logA[states[:, :-1], states[:, 1:]]  # [B, T-1]
        # transitions only between consecutive REAL frames
        lm = lm + jnp.sum(trans * mask[:, 1:], axis=-1)
        # final prob at the last real frame's state
        last = jnp.sum(mask, axis=-1).astype(jnp.int32) - 1
        lm = lm + graph.final_logp[
            jnp.take_along_axis(states, last[:, None], 1)[:, 0]]
        total = total + lm
    return total


def _num_logprob_split(graph: SplitDenGraph, loglik: jax.Array,
                       states: jax.Array, mask: jax.Array,
                       acoustic_scale: float, with_transitions: bool
                       ) -> jax.Array:
    """Numerator path score with per-arc emissions. Frame t (t < last)
    is consumed by the arc states[t] -> states[t+1]: its self-loop pdf
    when the pair stays AND the self-loop beats the (1-state phone)
    re-entry diagonal — the same Viterbi merge num_logprob applies for
    PhoneLoopDenGraph — otherwise the source's forward pdf. The last
    real frame is consumed by the exit arc (forward pdf + final_logp)."""
    em_f = acoustic_scale * jnp.take_along_axis(
        loglik, graph.state_pdf[states][..., None], axis=-1)[..., 0]
    em_s = acoustic_scale * jnp.take_along_axis(
        loglik, graph.self_pdf[states][..., None], axis=-1)[..., 0]
    prev, cur = states[:, :-1], states[:, 1:]
    stay = cur == prev
    self_sc = graph.self_logp[prev] + em_s[:, :-1]
    enter_sc = graph.logA_enter[prev, cur] + em_f[:, :-1]
    pair_sc = jnp.where(stay, jnp.maximum(self_sc, enter_sc), enter_sc)
    if not with_transitions:
        # same arc choice, emission part only
        pair_em = jnp.where(stay & (self_sc >= enter_sc),
                            em_s[:, :-1], em_f[:, :-1])
        total = jnp.sum(pair_em * mask[:, 1:], axis=-1)
        last = jnp.sum(mask, axis=-1).astype(jnp.int32) - 1
        total = total + jnp.take_along_axis(em_f, last[:, None],
                                            1)[:, 0]
        return total
    total = graph.start_logp[states[:, 0]] \
        + jnp.sum(pair_sc * mask[:, 1:], axis=-1)
    last = jnp.sum(mask, axis=-1).astype(jnp.int32) - 1
    s_last = jnp.take_along_axis(states, last[:, None], 1)[:, 0]
    total = total + jnp.take_along_axis(em_f, last[:, None], 1)[:, 0] \
        + graph.final_logp[s_last]
    return total


def mmi_objective(graph: DenGraph, loglik: jax.Array, states: jax.Array,
                  mask: jax.Array, acoustic_scale: float = 1.0
                  ) -> tuple[jax.Array, jax.Array]:
    """Summed negative MMI objective and per-batch den-minus-num (the
    reported 'mmi per frame' statistic). Minimize the first."""
    num = num_logprob(graph, loglik, states, mask, acoustic_scale)
    den = den_logprob(graph, loglik, mask, acoustic_scale)
    obj = jnp.sum(den - num)              # >= 0 up to path-prior slack
    return obj, jax.lax.stop_gradient(den - num)


def expected_accuracy(graph: DenGraph, loglik: jax.Array,
                      ref_pdfs: jax.Array, mask: jax.Array,
                      acoustic_scale: float = 1.0,
                      criterion: str = "smbr",
                      silence_phones: jax.Array | None = None
                      ) -> jax.Array:
    """E[A] per utterance: the posterior-expected frame accuracy under
    the dense denominator graph — the lattice-free form of nnet1's
    sMBR / MPE criteria (upstream nnet-train-mpe-sequential computes
    the same expectation over decode lattices).

    The identity: with logZ(em) the denominator log-partition,
    d logZ / d em(t,s) = gamma_t(s) (the per-frame state posterior), so
    E[A] = sum_t,s gamma_t(s) * acc(t,s) is exactly the jvp of logZ at
    em in the direction of the accuracy matrix. jax.jvp gives it in one
    forward pass, and grad-of-jvp (forward-over-reverse) gives the
    training gradient — the classic gamma*(acc - E[A]) MPE backward
    falls out of autodiff.

    criterion: "smbr" scores state accuracy by pdf match against
    `ref_pdfs` [B, T]; "mpe" by phone match (ref_pdfs then carries
    per-frame reference PHONES). `silence_phones` (int array) excludes
    those phones from accuracy, upstream's silence treatment.
    Returns E[A] [B] (differentiable w.r.t. loglik).
    """
    if criterion not in ("smbr", "mpe"):
        raise ValueError(f"unknown criterion {criterion!r}")

    def _acc(pdf_per_state):
        if criterion == "smbr":
            match = pdf_per_state[None, None, :] == ref_pdfs[:, :, None]
        else:
            match = graph.state_phone[None, None, :] \
                == ref_pdfs[:, :, None]
        acc = match.astype(jnp.float32) * mask[:, :, None]
        if silence_phones is not None and silence_phones.size:
            sil = jnp.isin(graph.state_phone, silence_phones)
            acc = acc * (~sil)[None, None, :].astype(jnp.float32)
        return acc

    if isinstance(graph, SplitDenGraph):
        # two emission tensors, two accuracy directions: a frame taken
        # on a self-loop arc is accurate iff its SELF pdf matches
        em_f, em_s = _prepare_em_split(graph, loglik, mask,
                                       acoustic_scale)
        _, ea = jax.jvp(
            lambda ef, es: _split_logZ_from_em(graph, ef, es, mask),
            (em_f, em_s), (_acc(graph.state_pdf), _acc(graph.self_pdf)))
        return ea
    em = _prepare_em(graph, loglik, mask, acoustic_scale)
    _, ea = jax.jvp(lambda e: _den_logZ_from_em(graph, e, mask),
                    (em,), (_acc(graph.state_pdf),))
    return ea


def smbr_objective(graph: DenGraph, loglik: jax.Array,
                   ref_pdfs: jax.Array, mask: jax.Array,
                   acoustic_scale: float = 1.0,
                   criterion: str = "smbr",
                   silence_phones: jax.Array | None = None
                   ) -> tuple[jax.Array, jax.Array]:
    """(negated summed E[A], per-utterance E[A]); minimize the first
    (gradient ascent on expected accuracy)."""
    ea = expected_accuracy(graph, loglik, ref_pdfs, mask,
                           acoustic_scale, criterion, silence_phones)
    return -jnp.sum(ea), jax.lax.stop_gradient(ea)


def den_graph_for(tm, phone_insertion_penalty: float = 0.0):
    """Pick the best denominator-graph representation for a transition
    model: the O(Ns) structured phone loop when the topology allows it,
    the dense DenGraph for exotic (skip-arc) triples-era topologies, and
    the per-arc SplitDenGraph for chain-style `<Tuples>` models with
    split self-loop/forward pdfs."""
    try:
        return PhoneLoopDenGraph.from_transition_model(
            tm, phone_insertion_penalty)
    except ValueError:
        g = PhoneLoopGraph.from_transition_model(
            tm, phone_insertion_penalty=phone_insertion_penalty)
        if np.array_equal(np.asarray(g.self_pdf),
                          np.asarray(g.state_pdf)):
            return DenGraph.from_phone_loop(g)
        return SplitDenGraph.from_phone_loop(g)


def alignment_to_states(tm, tids: np.ndarray) -> np.ndarray:
    """Transition-id alignment -> graph-state (tuple-index) path; the
    numerator path for MMI. Uses TransitionModel.id2tstate (1-based)."""
    tstates = np.asarray(tm.id2tstate)[np.asarray(tids, np.int64)]
    return (tstates - 1).astype(np.int32)
