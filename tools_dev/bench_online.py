"""Streaming latency benchmark (VERDICT r2 weak #4): per-chunk wall
latency of the OnlineRecognizer at chunk=20 frames (0.2 s audio),
broken into AM step (jit LSTM+affine dispatch + D2H fetch) and the
native Viterbi search advance.

Run on the TPU (plain python); CPU works too for the search-side
numbers. Prints one summary line per stage plus the end-to-end
per-chunk latency percentiles that BENCH_NOTES quotes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from kaldi_lstm_tpu.decode.graph import build_decoding_graph
    from kaldi_lstm_tpu.decode.online import OnlineRecognizer
    from kaldi_lstm_tpu.io.arpa import uniform_unigram
    from kaldi_lstm_tpu.io.transition_model import (
        make_monophone_transition_model,
    )
    from kaldi_lstm_tpu.models import Nnet

    print("devices:", jax.devices())
    # flagship-ish AM: 40 -> LSTMP(800c/512r) -> 7998, 1 stream
    nphones, sps = 2666, 3
    npdfs = nphones * sps
    proto = f"""<NnetProto>
<LstmProjectedStreams> <InputDim> 40 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> 1
<AffineTransform> <InputDim> 512 <OutputDim> {npdfs} <ParamStddev> 0.04
<Softmax> <InputDim> {npdfs} <OutputDim> {npdfs}
</NnetProto>
"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    tm = make_monophone_transition_model(nphones, sps)
    # small word graph (the AM dominates; graph size is a decode knob)
    rng = np.random.RandomState(0)
    lexicon = {f"w{i:03d}": [[int(p) for p in
                              rng.randint(1, nphones, rng.randint(2, 5))]]
               for i in range(50)}
    lm = uniform_unigram(sorted(lexicon))
    graph = build_decoding_graph(tm, lexicon, lm)
    print(f"graph: {graph.num_states} states, {graph.num_arcs()} arcs")

    log_prior = np.log(np.full(npdfs, 1.0 / npdfs, np.float32))
    rec = OnlineRecognizer(nnet, params, graph, log_prior=log_prior,
                           acoustic_scale=0.1, beam=14.0,
                           max_active=2000, targets_delay=5)
    native = rec.decoder._native is not None
    print("native search session:", native)

    chunk_frames = 20
    n_chunks = 60
    feats = rng.randn(n_chunks, chunk_frames, 40).astype(np.float32)

    am_ms, search_ms, total_ms = [], [], []
    # wrap the decoder advance to time search separately
    orig_advance = rec.decoder.advance

    def timed_advance(ll):
        t0 = time.perf_counter()
        orig_advance(ll)
        search_ms.append((time.perf_counter() - t0) * 1e3)

    rec.decoder.advance = timed_advance

    orig_score = rec._score

    def timed_score(frames):
        if frames.shape[0] == 0:
            return
        t0 = time.perf_counter()
        y, rec.states = rec._am_step(rec.params, rec.transf_params,
                                     jnp.asarray(frames,
                                                 jnp.float32)[None],
                                     rec.states)
        ll = np.asarray(y[0], np.float64)  # blocks: D2H fetch
        am_ms.append((time.perf_counter() - t0) * 1e3)
        if rec.log_prior is not None:
            ll = ll - rec.log_prior
        rec.decoder.advance(ll)

    rec._score = timed_score

    for i in range(n_chunks):
        t0 = time.perf_counter()
        rec.accept(feats[i])
        total_ms.append((time.perf_counter() - t0) * 1e3)
        if i == n_chunks - 1:
            res = rec.partial()
    warm_t = total_ms[3:]
    warm_a = am_ms[3:]
    warm_s = search_ms[3:]

    def pct(xs, p):
        return float(np.percentile(np.asarray(xs), p))

    print(f"chunks: {n_chunks} x {chunk_frames} frames "
          f"(={chunk_frames * 10} ms audio each); warmup 3 dropped")
    print(f"AM step+fetch ms: p50 {pct(warm_a, 50):.2f} "
          f"p90 {pct(warm_a, 90):.2f} p99 {pct(warm_a, 99):.2f}")
    print(f"search ms:        p50 {pct(warm_s, 50):.2f} "
          f"p90 {pct(warm_s, 90):.2f} p99 {pct(warm_s, 99):.2f}")
    print(f"per-chunk ms:     p50 {pct(warm_t, 50):.2f} "
          f"p90 {pct(warm_t, 90):.2f} p99 {pct(warm_t, 99):.2f} "
          f"(budget {chunk_frames * 10} ms for realtime)")
    rtf = pct(warm_t, 50) / (chunk_frames * 10)
    print(f"median real-time factor: {rtf:.3f} "
          f"({'OK' if rtf < 1 else 'OVER'} realtime), partial hyp "
          f"{len(res.words)} words")


if __name__ == "__main__":
    main()
