"""Multi-host training support.

The reference is single-process (SURVEY.md §2.3); these are the pieces a
multi-host TPU pod run needs:

* `initialize()` — jax.distributed bootstrap (env/args-driven);
* per-host data feeding: each host runs its own StreamScheduler over its
  shard of the corpus and assembles the *global* [S_global, T] batch from
  process-local stream rows via `jax.make_array_from_process_local_data`;
* the **cross-host termination rule** the reference never needed
  (SURVEY.md §7 hard parts): pjit steps are collective, so every host
  must execute the same step count. `SyncedScheduler` counts its natural
  batches, all-reduces the max across hosts, and pads its tail with
  empty (fully masked, no-reset) batches — masked frames contribute zero
  gradient and zero stats, so trailing empty batches only spin the
  allreduce.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from kaldi_lstm_tpu.train.streams import StreamBatch, StreamScheduler


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; with no args, relies on the
    TPU pod environment."""
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


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

    Provide `lengths` (this host's usable utterance lengths, in reader
    order — e.g. from the posterior reader's num_frames) for a zero-copy
    count; otherwise the local batches are buffered. `agree_fn` reduces
    the local count to the global max (defaults to multihost allreduce;
    injectable for tests)."""

    def __init__(self, scheduler: StreamScheduler, agree_fn=None,
                 lengths=None):
        self.scheduler = scheduler
        if lengths is not None:
            self._batches = None
            local = count_batches(lengths, scheduler.S, scheduler.T)
        else:
            self._batches = list(scheduler)
            local = len(self._batches)
        if agree_fn is None:
            agree_fn = _allreduce_max
        self.target_steps = int(agree_fn(local))

    def __iter__(self) -> Iterator[StreamBatch]:
        S, T = self.scheduler.S, self.scheduler.T
        D, K = self.scheduler.feat_dim, self.scheduler.K
        n = 0
        for b in (self._batches if self._batches is not None
                  else self.scheduler):
            yield b
            n += 1
        for _ in range(self.target_steps - n):
            yield empty_batch(S, T, D, K)


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
