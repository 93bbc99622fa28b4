"""Per-process driver for the 2-process CPU integration test
(tests/test_multiprocess.py). Executes the REAL multi-process code paths
that single-process tests cannot reach:

* `jax.distributed.initialize` with a localhost coordinator
  (parallel/multihost.py initialize, via the CLI flags);
* the live SyncedScheduler continue-flag protocol through the real
  `_allreduce_max` (process_allgather over Gloo);
* `shard_batch_to_mesh` / `shard_group_to_mesh` through
  `jax.make_array_from_process_local_data`;
* collective param gathering (`MeshPlan.gather_params`).

Usage: python mp_driver.py <proc_id> <num_procs> <port> <workdir> <group>
Each process trains the SAME model over ITS OWN corpus shard (shard 1 is
smaller, so that host exhausts early and pads with filler batches), then
re-runs the library path and saves its gathered params + stats.
"""

import json
import os
import sys


def main():
    proc_id, num_procs, port = (int(a) for a in sys.argv[1:4])
    work = sys.argv[4]
    step_group = int(sys.argv[5])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import numpy as np

    from kaldi_lstm_tpu.tools import train_lstm_streams

    shard = os.path.join(work, f"shard{proc_id}")
    model_out = os.path.join(work, "mp.nnet")
    argv = [
        f"scp:{shard}/feats.scp", f"ark:{shard}/post.ark",
        os.path.join(work, "nnet.init"), model_out,
        "--learn-rate=1e-3", "--num-stream=4", "--targets-delay=0",
        "--mesh", "data=8", "--sync-every=2",
        "--coordinator-address", f"localhost:{port}",
        "--num-processes", str(num_procs), "--process-id", str(proc_id),
        "--verbose=0",
    ]
    if step_group > 1:
        argv += ["--step-group", str(step_group)]
    rc, stats = train_lstm_streams.run_main(argv)
    assert rc == 0, f"CLI failed on process {proc_id}"

    import jax

    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 4 * num_procs

    # library pass on the same shards: keeps the (sharded) result params
    # in hand so EVERY process can gather and save them for the
    # cross-process equality assertion
    from kaldi_lstm_tpu.io.kaldi_io import (
        RandomAccessPosteriorReader,
        SequentialMatrixReader,
    )
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.parallel import MeshPlan, make_mesh
    from kaldi_lstm_tpu.train import StreamScheduler, TrainOptions, \
        run_epoch

    nnet, params = Nnet.read(os.path.join(work, "nnet.init"))
    sched = StreamScheduler(
        iter(SequentialMatrixReader(f"scp:{shard}/feats.scp")),
        RandomAccessPosteriorReader(f"ark:{shard}/post.ark"),
        feat_dim=nnet.input_dim, num_stream=4, batch_size=20,
        targets_delay=0)
    plan = MeshPlan(make_mesh(data=8, model=1), nnet)
    opts = TrainOptions(learn_rate=1e-3, momentum=0.9)
    res = run_epoch(nnet, params, sched, opts, plan=plan, sync_every=2,
                    step_group=step_group)
    gathered = plan.gather_params(res.params)
    flat = np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree_util.tree_leaves(gathered)])
    np.save(os.path.join(work, f"params_p{proc_id}.npy"), flat)
    with open(os.path.join(work, f"stats_p{proc_id}.json"), "w") as f:
        json.dump({"cli_avg_loss": stats.avg_loss(),
                   "lib_avg_loss": res.stats.avg_loss(),
                   "lib_frames": res.total_frames,
                   "target_steps": None}, f)
    print(f"proc {proc_id} done", flush=True)


if __name__ == "__main__":
    main()
