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


def _den_logZ_from_em(graph: DenGraph, em: jax.Array,
                      mask: jax.Array) -> jax.Array:
    """Exact logsumexp forward over the dense graph on prepared
    per-state emissions em [B, T, Ns] (padded frames must be 0 in em);
    returns log p(X | den graph) [B]."""
    alpha0 = graph.start_logp[None, :] + em[:, 0]            # [B, Ns]

    def step(alpha, inputs):
        em_t, m_t = inputs                                   # [B,Ns],[B]
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
    B, T = states.shape
    pdfs = graph.state_pdf[states]                           # [B, T]
    ac = acoustic_scale * jnp.take_along_axis(
        loglik, pdfs[..., None], axis=-1)[..., 0]            # [B, T]
    total = jnp.sum(ac * mask, axis=-1)
    if with_transitions:
        lm = graph.start_logp[states[:, 0]]
        trans = graph.logA[states[:, :-1], states[:, 1:]]    # [B, T-1]
        # transitions only between consecutive REAL frames
        lm = lm + jnp.sum(trans * mask[:, 1:], axis=-1)
        # final prob at the last real frame's state
        last = jnp.sum(mask, axis=-1).astype(jnp.int32) - 1
        lm = lm + graph.final_logp[
            jnp.take_along_axis(states, last[:, None], 1)[:, 0]]
        total = total + lm
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
    em = _prepare_em(graph, loglik, mask, acoustic_scale)
    if criterion == "smbr":
        match = graph.state_pdf[None, None, :] == ref_pdfs[:, :, None]
    elif criterion == "mpe":
        match = graph.state_phone[None, None, :] == ref_pdfs[:, :, None]
    else:
        raise ValueError(f"unknown criterion {criterion!r}")
    acc = match.astype(jnp.float32) * mask[:, :, None]
    if silence_phones is not None and silence_phones.size:
        sil = jnp.isin(graph.state_phone, silence_phones)
        acc = acc * (~sil)[None, None, :].astype(jnp.float32)
    _, ea = jax.jvp(lambda e: _den_logZ_from_em(graph, e, mask),
                    (em,), (acc,))
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


def alignment_to_states(tm, tids: np.ndarray) -> np.ndarray:
    """Transition-id alignment -> graph-state (tuple-index) path; the
    numerator path for MMI. Uses TransitionModel.id2tstate (1-based)."""
    tstates = np.asarray(tm.id2tstate)[np.asarray(tids, np.int64)]
    return (tstates - 1).astype(np.int32)
