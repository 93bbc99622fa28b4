"""Multi-host training support.

The reference is single-process (SURVEY.md §2.3); these are the pieces a
multi-host TPU pod run needs:

* `initialize()` — jax.distributed bootstrap (env/args-driven);
* per-host data feeding: each host runs its own StreamScheduler over its
  shard of the corpus and assembles the *global* [S_global, T] batch from
  process-local stream rows via `jax.make_array_from_process_local_data`;
* the **cross-host termination rule** the reference never needed
  (SURVEY.md §7 hard parts): pjit steps are collective, so every host
  must execute the same step count. `SyncedScheduler` keeps hosts in
  lock-step with a periodically all-reduced continue flag and pads
  locally-exhausted hosts with empty (fully masked, no-reset) batches —
  masked frames contribute zero gradient and zero stats, so trailing
  empty batches only spin the allreduce. The flag protocol is robust to
  RUNTIME utterance skips (missing targets / length mismatch,
  train/streams.py:139-181): a host whose scheduler rejects data
  mid-epoch simply reaches its local end earlier and fills, while a
  host with more real batches than anyone predicted keeps every other
  host stepping — no step-count agreement is ever computed from a
  pre-skip view of the data.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from kaldi_lstm_tpu.train.streams import StreamBatch, StreamScheduler


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; with no args, relies on the
    TPU pod environment. Idempotent — a recipe driving several trainer
    invocations in one process initializes once."""
    import jax
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized in this process
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process): used after rank-0
    model writes so other ranks never read a half-written file when the
    recipe immediately re-opens it (CV / next iteration)."""
    import jax
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def empty_batch(S: int, T: int, D: int, K: int = 1) -> StreamBatch:
    """A fully masked batch: zero gradient, zero stats, no state reset —
    safe filler to keep collectives in step after local data exhaustion."""
    return StreamBatch(
        feats=np.zeros((S, T, D), np.float32),
        tgt_ids=np.zeros((S, T, K), np.int32),
        tgt_weights=np.zeros((S, T, K), np.float32),
        mask=np.zeros((S, T), np.float32),
        reset_flags=np.zeros(S, np.int32),
        num_new_utts=0)


def count_batches(lengths, num_stream: int, batch_size: int) -> int:
    """Exact batch count a StreamScheduler will emit for utterances of
    the given lengths (same round-robin refill; lengths-only simulation,
    no data). Used to agree on the global step count without buffering
    an epoch of features."""
    it = iter(lengths)
    curt = [0] * num_stream
    lent = [0] * num_stream
    fed = [False] * num_stream
    batches = 0
    while True:
        for s in range(num_stream):
            if curt[s] < lent[s]:
                continue
            nxt = next(it, None)
            if nxt is None:
                continue
            curt[s], lent[s], fed[s] = 0, int(nxt), True
        if not any(c < l for c, l in zip(curt, lent)):
            return batches
        for s in range(num_stream):
            if fed[s]:
                curt[s] += batch_size
        batches += 1


class SyncedScheduler:
    """Wraps a StreamScheduler so all hosts yield the same batch count.

    Protocol (default, `lengths=None`): batches stream lazily from the
    local scheduler; every `agree_every` steps all hosts agree (max
    allreduce) on whether ANY host still has real data. While any does,
    every host yields exactly `agree_every` batches — real ones where it
    has them, fully-masked fillers where it doesn't — so the collective
    step count is identical on all hosts *by construction*, including
    when a host's scheduler skips utterances at runtime (missing
    targets / length mismatch, train/streams.py:139-181). Cost: one tiny
    host allgather per `agree_every` training steps, plus at most
    `agree_every - 1` trailing filler steps per host.

    `lengths` mode (optional fast path): provide this host's usable
    utterance lengths for a one-shot exact count with NO per-step
    collectives. Only safe when the lengths describe exactly what the
    scheduler will accept (pre-validated manifests); if the live
    scheduler nevertheless emits more batches than the agreed target —
    the silent-desync case — this raises instead of hanging a
    collective.

    `agree_fn` reduces a local int to the global max (defaults to a
    multihost allreduce; injectable for tests)."""

    def __init__(self, scheduler: StreamScheduler, agree_fn=None,
                 lengths=None, agree_every: int = 1):
        self.scheduler = scheduler
        self.agree_every = max(1, int(agree_every))
        self._agree = agree_fn if agree_fn is not None else _allreduce_max
        if lengths is not None:
            local = count_batches(lengths, scheduler.S, scheduler.T)
            self.target_steps = int(self._agree(local))
        else:
            self.target_steps = None  # discovered while iterating

    # StreamScheduler-compatible surface so run_epoch (train/trainer.py)
    # can consume a SyncedScheduler directly
    @property
    def S(self):
        return self.scheduler.S

    @property
    def T(self):
        return self.scheduler.T

    @property
    def feat_dim(self):
        return self.scheduler.feat_dim

    @property
    def K(self):
        return self.scheduler.K

    @property
    def num_done(self):
        return self.scheduler.num_done

    @property
    def num_no_tgt_mat(self):
        return self.scheduler.num_no_tgt_mat

    @property
    def num_other_error(self):
        return self.scheduler.num_other_error

    @property
    def total_valid_frames(self):
        return self.scheduler.total_valid_frames

    def _filler(self) -> StreamBatch:
        return empty_batch(self.scheduler.S, self.scheduler.T,
                           self.scheduler.feat_dim, self.scheduler.K)

    def _iter_counted(self) -> Iterator[StreamBatch]:
        n = 0
        for b in self.scheduler:
            if n >= self.target_steps:
                raise RuntimeError(
                    f"SyncedScheduler lengths-mode desync: local scheduler "
                    f"produced more than the agreed {self.target_steps} "
                    f"batches — the provided lengths disagree with what "
                    f"the scheduler accepted at runtime (skipped/extra "
                    f"utterances?). Use the default live mode "
                    f"(lengths=None), which is skip-robust.")
            yield b
            n += 1
        for _ in range(self.target_steps - n):
            yield self._filler()

    def _iter_live(self) -> Iterator[StreamBatch]:
        it = iter(self.scheduler)
        nxt = next(it, None)
        steps = 0
        while True:
            if not int(self._agree(int(nxt is not None))):
                self.target_steps = steps
                return
            for _ in range(self.agree_every):
                if nxt is not None:
                    yield nxt
                    nxt = next(it, None)
                else:
                    yield self._filler()
                steps += 1

    def __iter__(self) -> Iterator[StreamBatch]:
        # the underlying StreamScheduler is single-use: a second pass
        # (either mode) would silently yield only filler batches and
        # train on nothing — refuse instead
        if getattr(self, "_iterated", False):
            raise RuntimeError(
                "SyncedScheduler is single-use (its StreamScheduler is "
                "exhausted); construct a new one with fresh readers "
                "per epoch")
        self._iterated = True
        if self.target_steps is not None:
            return self._iter_counted()
        return self._iter_live()


def _allreduce_max(local_count: int) -> int:
    import jax
    if jax.process_count() == 1:
        return local_count
    from jax.experimental import multihost_utils
    counts = multihost_utils.process_allgather(
        np.asarray([local_count], np.int64))
    return int(np.max(counts))


def shard_batch_to_mesh(plan, batch: StreamBatch):
    """Assemble a global device batch from this process's local stream
    rows. Single-process: plain device_put with the plan's shardings.
    Multi-process: `make_array_from_process_local_data` treats each
    host's [S_local, ...] block as its slice of the global [S_global, ...]
    array along the 'data' axis."""
    import jax
    if jax.process_count() == 1:
        return plan.place_batch(batch.feats, batch.tgt_ids,
                                batch.tgt_weights, batch.mask,
                                batch.reset_flags)
    bs = plan.batch_sharding()

    def put(local, sharding):
        return jax.make_array_from_process_local_data(sharding, local)

    return (put(batch.feats, bs["feats"]),
            put(batch.tgt_ids, bs["tgt_ids"]),
            put(batch.tgt_weights, bs["tgt_weights"]),
            put(batch.mask, bs["mask"]),
            put(batch.reset_flags, bs["reset_flags"]))


def shard_group_to_mesh(plan, batches):
    """Stack B StreamBatches into one grouped device batch ([B, S, ...],
    group axis replicated, streams over 'data') for the grouped sharded
    step. Multi-process placement mirrors shard_batch_to_mesh."""
    import jax
    feats = np.stack([b.feats for b in batches])
    ids = np.stack([b.tgt_ids for b in batches])
    w = np.stack([b.tgt_weights for b in batches])
    mask = np.stack([b.mask for b in batches])
    flags = np.stack([b.reset_flags for b in batches])
    if jax.process_count() == 1:
        return plan.place_batch(feats, ids, w, mask, flags, group=True)
    bs = plan.batch_sharding(group=True)

    def put(local, sharding):
        return jax.make_array_from_process_local_data(sharding, local)

    return (put(feats, bs["feats"]), put(ids, bs["tgt_ids"]),
            put(w, bs["tgt_weights"]), put(mask, bs["mask"]),
            put(flags, bs["reset_flags"]))
