"""Input-pipeline throughput at corpus scale (ROADMAP #5).

Generates an ark of the requested size, then measures:
  * native C++ ark offset scan (klt_scan_matrix_ark) MB/s;
  * sequential ark epoch (zero-copy views) MB/s;
  * scp epoch via the mmap fast path MB/s (the multi-epoch access
    pattern), first epoch (page-cache cold-ish) and second epoch;
  * StreamScheduler end-to-end batches/s on top of the scp source.

CPU-only:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \\
               python tools_dev/bench_io.py --mb 1024
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from kaldi_lstm_tpu.io.kaldi_io import (  # noqa: E402
    MatrixWriter,
    PosteriorWriter,
    RandomAccessPosteriorReader,
    SequentialMatrixReader,
)


def make_corpus(d: str, target_mb: int, feat_dim: int = 40,
                utt_frames: int = 1000) -> int:
    bytes_per_utt = utt_frames * feat_dim * 4
    n_utts = max(4, target_mb * (1 << 20) // bytes_per_utt)
    rng = np.random.RandomState(0)
    base = rng.randn(utt_frames, feat_dim).astype(np.float32)
    with MatrixWriter(f"ark,scp:{d}/feats.ark,{d}/feats.scp") as fw, \
            PosteriorWriter(f"ark:{d}/post.ark") as pw:
        for i in range(n_utts):
            key = f"utt{i:07d}"
            fw.write(key, base)  # content identical; size is what matters
            pw.write(key, [[(int(i) % 100, 1.0)]
                           for i in range(utt_frames)])
    return n_utts


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=1024)
    p.add_argument("--feat-dim", type=int, default=40)
    p.add_argument("--dir", default="")
    args = p.parse_args()

    ctx = tempfile.TemporaryDirectory() if not args.dir else None
    d = args.dir or ctx.name
    os.makedirs(d, exist_ok=True)

    t0 = time.perf_counter()
    n_utts = make_corpus(d, args.mb, args.feat_dim)
    size = os.path.getsize(f"{d}/feats.ark")
    mb = size / (1 << 20)
    print(f"corpus: {n_utts} utts, {mb:.0f} MB ark "
          f"(wrote in {time.perf_counter() - t0:.1f}s)")

    # 1. native offset scan
    from kaldi_lstm_tpu.io import native
    assert native.get_lib() is not None, "native lib unavailable"
    t0 = time.perf_counter()
    recs = native.scan_matrix_ark(f"{d}/feats.ark")
    dt = time.perf_counter() - t0
    print(f"native ark scan: {len(recs)} records, {mb / dt:.0f} MB/s "
          f"({dt * 1e3:.1f} ms)")

    # 2. sequential ark epoch (zero-copy views + checksum touch)
    for label in ("ark epoch 1", "ark epoch 2"):
        t0 = time.perf_counter()
        acc, n = 0.0, 0
        for key, m in SequentialMatrixReader(f"ark:{d}/feats.ark"):
            acc += float(m[0, 0])  # touch first page only (offset cost)
            n += 1
        dt = time.perf_counter() - t0
        print(f"{label} (scan+index): {n} utts, {mb / dt:.0f} MB/s")

    # 3. scp epochs through the mmap fast path, materializing every value
    for label in ("scp epoch 1", "scp epoch 2"):
        t0 = time.perf_counter()
        acc, n = 0.0, 0
        for key, m in SequentialMatrixReader(f"scp:{d}/feats.scp"):
            acc += float(np.sum(m[::97]))  # touch pages across the record
            n += 1
        dt = time.perf_counter() - t0
        print(f"{label} (mmap views, touched): {n} utts, "
              f"{mb / dt:.0f} MB/s")

    # 4. scheduler end-to-end
    from kaldi_lstm_tpu.train.streams import StreamScheduler
    targets = RandomAccessPosteriorReader(f"ark:{d}/post.ark")
    sched = StreamScheduler(
        iter(SequentialMatrixReader(f"scp:{d}/feats.scp")), targets,
        feat_dim=args.feat_dim, num_stream=64, batch_size=20,
        targets_delay=5)
    t0 = time.perf_counter()
    nb = 0
    frames = 0
    for batch in sched:
        nb += 1
        frames += int(batch.mask.sum())
    dt = time.perf_counter() - t0
    print(f"scheduler: {nb} batches ({frames} frames) in {dt:.2f}s = "
          f"{nb / dt:.0f} batches/s, {frames / dt / 1e6:.1f} Mframes/s, "
          f"{frames / dt * args.feat_dim * 4 / (1 << 20):.0f} MB/s "
          f"feature bandwidth")
    return 0


if __name__ == "__main__":
    sys.exit(main())
