"""Sticky-session serving benchmark under a Poisson arrival trace
(VERDICT r4 item 3 'Done' criteria): p50/p99 per-tick latency, slot
occupancy, bind-wait distribution, and audio throughput for
StickySessionServer on the current backend.

Sessions arrive by a Poisson process (--lambda sessions per virtual
second); each streams one CV utterance in 200 ms chunks, one chunk per
tick (a tick = 20 virtual ms * --tick-frames/2 ... i.e. tick duration
= --tick-frames * 10 ms of audio). The loop runs as fast as the chip
allows; per-tick WALL time is the serving latency a synchronized
arrival would see, and bind-wait counts ticks a session queued for a
slot.

Self-contained by default (synthesizes a small word corpus + briefly
trained AM in a temp dir); point --dir at an experiment directory
(final.nnet, final.mdl, lexicon.txt, lm.arpa, words.txt,
feats/cv.scp, targets/counts.vec, feats/feature_transform.nnet.txt)
to serve a real model, e.g. /tmp/klt_flagship.

  python tools_dev/bench_serve_sticky.py --slots 16 --lambda 4
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python ... (CPU check)
"""

import argparse
import sys
import tempfile
import time

import numpy as np


def _toy_world(d):
    import jax

    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.ali_to_pdf import main as ali_to_pdf
    from kaldi_lstm_tpu.tools.ali_to_post import main as ali_to_post
    from kaldi_lstm_tpu.tools.compute_class_counts import main as counts
    from kaldi_lstm_tpu.tools.make_word_synth_data import main as mk
    from kaldi_lstm_tpu.tools.train_lstm_streams import main as train
    assert mk(["--dir", d, "--num-words", "40", "--num-phones", "15",
               "--states-per-phone", "2", "--feat-dim", "20",
               "--num-utts", "200", "--min-pron", "2", "--max-pron", "4",
               "--max-words", "10", "--sil-prob", "0.2",
               "--emission-noise", "0.4"]) == 0
    assert ali_to_pdf([f"{d}/final.mdl", f"ark:{d}/ali.ark",
                       f"ark:{d}/pdf_ali.ark"]) == 0
    assert ali_to_post([f"ark:{d}/pdf_ali.ark", f"ark:{d}/post.ark"]) == 0
    proto = """<NnetProto>
<LstmProjectedStreams> <InputDim> 20 <OutputDim> 64 <CellDim> 100 <ParamScale> 0.05 <NumStream> 8
<AffineTransform> <InputDim> 64 <OutputDim> 30 <ParamStddev> 0.1
<Softmax> <InputDim> 30 <OutputDim> 30
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    nnet.write(f"{d}/nnet.iter0", params, binary=True)
    assert train([f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
                  f"{d}/nnet.iter0", f"{d}/final.nnet",
                  "--learn-rate=5e-3", "--num-stream=8",
                  "--targets-delay=0"]) == 0
    assert counts([f"ark:{d}/post.ark", f"{d}/counts.vec",
                   "--num-classes", "30", "--counts-offset", "1"]) == 0
    return dict(nnet=f"{d}/final.nnet", mdl=f"{d}/final.mdl",
                lexicon=f"{d}/lexicon.txt", arpa=f"{d}/lm.arpa",
                words=f"{d}/words.txt", cv=f"scp:{d}/feats.scp",
                counts=f"{d}/counts.vec", transf="")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="",
                   help="experiment dir with a trained flagship model; "
                        "empty = self-contained toy world")
    p.add_argument("--slots", type=int, default=16)
    p.add_argument("--tick-frames", type=int, default=20)
    p.add_argument("--lambda", dest="lam", type=float, default=4.0,
                   help="Poisson session arrivals per virtual second")
    p.add_argument("--sessions", type=int, default=120,
                   help="total sessions to serve")
    p.add_argument("--top-p", type=int, default=0)
    p.add_argument("--beam", type=float, default=16.0)
    p.add_argument("--acoustic-scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from kaldi_lstm_tpu.decode.graph import build_graph_from_arpa
    from kaldi_lstm_tpu.decode.scoring import (
        log_priors_from_counts,
        read_class_frame_counts,
    )
    from kaldi_lstm_tpu.decode.serve import StickySessionServer
    from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader
    from kaldi_lstm_tpu.io.lang import SymbolTable, read_lexicon
    from kaldi_lstm_tpu.io.transition_model import TransitionModel
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    if args.dir:
        d = args.dir
        w = dict(nnet=f"{d}/exp/final.nnet", mdl=f"{d}/lang/final.mdl",
                 lexicon=f"{d}/lang/lexicon.txt",
                 arpa=f"{d}/lang/lm.arpa", words=f"{d}/lang/words.txt",
                 cv=f"scp:{d}/feats/cv.scp",
                 counts=f"{d}/targets/counts.vec",
                 transf=f"{d}/feats/feature_transform.nnet.txt")
    else:
        w = _toy_world(tempfile.mkdtemp(prefix="klt_serve_bench_"))

    nnet, params = Nnet.read(w["nnet"])
    transf = transf_params = None
    if w["transf"]:
        transf, transf_params = Nnet.read(w["transf"])
    tm = TransitionModel.load(w["mdl"])
    graph = build_graph_from_arpa(
        tm, read_lexicon(w["lexicon"]), w["arpa"],
        words=SymbolTable.load(w["words"]))
    log_prior = log_priors_from_counts(
        read_class_frame_counts(w["counts"]))

    feats = []
    for k, m in SequentialMatrixReader(w["cv"]):
        feats.append((k, np.asarray(m, np.float32)))
        if len(feats) >= args.sessions:
            break
    while len(feats) < args.sessions:   # cycle if cv is small
        k, m = feats[len(feats) % max(len(feats), 1)]
        feats.append((f"{k}_r{len(feats)}", m))

    srv = StickySessionServer(
        nnet, params, graph, args.slots,
        chunk_frames=args.tick_frames, transf=transf,
        transf_params=transf_params, log_prior=log_prior,
        acoustic_scale=args.acoustic_scale, beam=args.beam,
        top_p=args.top_p)

    # Poisson arrivals in VIRTUAL time; one tick = tick_frames*10ms
    rng = np.random.RandomState(args.seed)
    tick_s = args.tick_frames * 0.010
    arrivals = np.cumsum(rng.exponential(1.0 / args.lam,
                                         args.sessions))  # seconds
    cursors = {}
    bind_tick = {}
    arrive_tick = {}
    t_virtual = 0.0
    tick_walls = []
    total_frames = 0
    i_next = 0
    tick = 0
    t_bench0 = time.perf_counter()
    while len(srv.results) < args.sessions:
        # admit sessions whose arrival time has passed
        while i_next < args.sessions and arrivals[i_next] <= t_virtual:
            k, m = feats[i_next]
            sid = f"s{i_next:05d}"
            srv.submit(sid, m[:0])
            arrive_tick[sid] = tick
            if len(m) == 0:
                srv.end_stream(sid)   # empty utterance: close now
            else:
                cursors[sid] = (m, 0)
            i_next += 1
        # each live session streams one chunk per tick
        for sid in list(cursors):
            m, pos = cursors[sid]
            if pos >= len(m):
                continue
            n = min(args.tick_frames, len(m) - pos)
            srv.submit(sid, m[pos:pos + n])
            cursors[sid] = (m, pos + n)
            if pos + n >= len(m):
                srv.end_stream(sid)
        for s in srv.slots:
            if s is not None and s.sid not in bind_tick:
                bind_tick[s.sid] = tick
        t0 = time.perf_counter()
        total_frames += srv.tick()
        tick_walls.append(time.perf_counter() - t0)
        t_virtual += tick_s
        tick += 1
        if tick > 200000:
            print("bench did not converge", file=sys.stderr)
            return 1
    bench_wall = time.perf_counter() - t_bench0

    walls = np.array(tick_walls[3:]) * 1000.0  # ms, skip compile ticks
    waits = np.array([bind_tick.get(f"s{i:05d}", 0)
                      - arrive_tick.get(f"s{i:05d}", 0)
                      for i in range(args.sessions)], float)
    audio_s = total_frames / 100.0
    print(f"sticky-serve bench: {args.sessions} sessions, "
          f"{args.slots} slots, lambda {args.lam}/s, "
          f"tick {args.tick_frames} frames, top_p {args.top_p}")
    print(f"  per-tick wall: p50 {np.percentile(walls, 50):.1f} ms, "
          f"p90 {np.percentile(walls, 90):.1f} ms, "
          f"p99 {np.percentile(walls, 99):.1f} ms "
          f"(tick budget {tick_s * 1000:.0f} ms; "
          f"RTF {np.percentile(walls, 50) / (tick_s * 1000):.3f})")
    print(f"  occupancy {srv.occupancy:.2f}; bind-wait ticks: "
          f"p50 {np.percentile(waits, 50):.0f}, "
          f"p99 {np.percentile(waits, 99):.0f}, max {waits.max():.0f}")
    print(f"  {audio_s:.0f} audio-s scored in {bench_wall:.1f}s wall "
          f"({audio_s / bench_wall:.0f} audio-s/s); "
          f"{len(srv.results)} finalized")
    return 0


if __name__ == "__main__":
    sys.exit(main())
