"""Batched streaming SERVING benchmark (VERDICT r3 item 4): N
concurrent carried-state streaming AM sessions on one chip with a
per-chunk deadline, chunk latency vs N, plus the host-side search cost
for the same tick (native Viterbi sessions on the host CPUs).

The serving shape: a ticker batches N live sessions' 200 ms chunks into
ONE [N, 20, 40] device step (OnlineBatchScorer — the google variant's
multi-stream machinery applied to inference), fetches the [N, 20, K]
log-likelihood block in one transfer, and hands rows to per-session
host Viterbi searches. AM dispatch+fetch is the chip-side serving cost;
search advances are embarrassingly parallel on host cores.

Usage: python tools_dev/bench_online_batched.py [chunks] [search_N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def main():
    import jax
    import jax.numpy as jnp

    from kaldi_lstm_tpu.decode.graph import build_decoding_graph
    from kaldi_lstm_tpu.decode.online import (
        OnlineBatchScorer,
        OnlineDecoder,
    )
    from kaldi_lstm_tpu.io.arpa import uniform_unigram
    from kaldi_lstm_tpu.io.transition_model import (
        make_monophone_transition_model,
    )
    from kaldi_lstm_tpu.models import Nnet

    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    search_n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    mode = sys.argv[3] if len(sys.argv) > 3 else "full"
    print("devices:", jax.devices(), flush=True)

    nphones, sps = 2666, 3
    npdfs = nphones * sps
    proto = f"""<NnetProto>
<LstmProjectedStreams> <InputDim> 40 <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> 1
<AffineTransform> <InputDim> 512 <OutputDim> {npdfs} <ParamStddev> 0.04
<Softmax> <InputDim> {npdfs} <OutputDim> {npdfs}
</NnetProto>
"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    chunk = 20  # 200 ms audio
    rng = np.random.RandomState(0)
    log_prior = np.log(np.full(npdfs, 1.0 / npdfs, np.float32))

    # ---- chip side: AM chunk latency vs N -------------------------------
    if mode == "topp":
        # pruned-fetch serving configs: device-side top-P + bf16 values
        # — the posterior transfer was measured transport-bound (~30
        # MB/s tunnel), so the payload is the whole game
        configs = [(N, f"top{P}-bf16", dict(fetch_dtype=jnp.bfloat16,
                                            top_p=P))
                   for N in (64, 256, 512) for P in (512, 128)]
    elif mode == "pipe":
        # pipelined double-buffering: does the transport overlap the
        # k-1 fetch with tick k's compute? (+1 chunk latency; measures
        # sustained throughput — per-chunk wall here is per-TICK)
        configs = [(N, f"top128-bf16-{tag}",
                    dict(fetch_dtype=jnp.bfloat16, top_p=128,
                         pipeline=pl))
                   for N in (64, 256) for tag, pl in (("eager", False),
                                                      ("pipe", True))]
    else:
        configs = [(N, nm, dict(fetch_dtype=dt))
                   for N in (64, 128, 256, 512)
                   for nm, dt in (("f32", None), ("bf16", jnp.bfloat16))]
    for N, fetch_name, kw in configs:
            sc = OnlineBatchScorer(nnet, params, N, log_prior=log_prior,
                                   **kw)
            feats = rng.randn(N, chunk, 40).astype(np.float32)
            sc.score(feats)  # compile + settle
            lat = []
            for i in range(n_chunks):
                t0 = time.perf_counter()
                ll = sc.score(feats)
                lat.append((time.perf_counter() - t0) * 1e3)
            if ll is None:  # pipeline mode's first tick
                ll = sc.flush()
            checksum = float(np.asarray(ll, np.float32).sum())
            lat = lat[2:]
            p50 = pct(lat, 50)
            audio = N * chunk * 10e-3 / (p50 * 1e-3)
            P = kw.get("top_p", 0)
            vb = np.dtype(np.float32).itemsize \
                if kw.get("fetch_dtype") is None else 2
            payload = (N * chunk * P * (vb + 4) if P
                       else N * chunk * npdfs * vb)
            print(f"AM N={N:4d} fetch={fetch_name}: per-chunk p50 "
                  f"{p50:7.1f} ms p90 {pct(lat, 90):7.1f} p99 "
                  f"{pct(lat, 99):7.1f} (budget 200 ms "
                  f"{'OK' if p50 < 200 else 'OVER'}), sustained "
                  f"{audio:7.0f} audio-s/s, payload "
                  f"{payload / 1e6:.0f} MB/chunk (chk {checksum:.1f})",
                  flush=True)

    # ---- host side: N native search sessions per tick -------------------
    tm = make_monophone_transition_model(nphones, sps)
    lexicon = {f"w{i:03d}": [[int(p) for p in
                              rng.randint(2, nphones, rng.randint(2, 5))]]
               for i in range(50)}
    graph = build_decoding_graph(tm, lexicon, uniform_unigram(
        sorted(lexicon)))
    print(f"search graph: {graph.num_states} states", flush=True)
    decs = [OnlineDecoder(graph, 0.1, 14.0, 2000)
            for _ in range(search_n)]
    ll = rng.randn(search_n, chunk, npdfs).astype(np.float64) * 2 - 5
    from concurrent.futures import ThreadPoolExecutor
    workers = os.cpu_count() or 2
    pool = ThreadPoolExecutor(workers)
    lat = []
    for i in range(8):
        t0 = time.perf_counter()
        list(pool.map(lambda d_l: d_l[0].advance(d_l[1]),
                      zip(decs, ll)))
        lat.append((time.perf_counter() - t0) * 1e3)
    print(f"search: {search_n} native sessions/tick on {workers} host "
          f"cores: p50 {pct(lat[1:], 50):.1f} ms/tick "
          f"({pct(lat[1:], 50) / search_n:.2f} ms/session; budget "
          f"200 ms)", flush=True)


if __name__ == "__main__":
    main()
