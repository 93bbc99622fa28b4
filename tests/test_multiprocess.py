"""True multi-process integration test (VERDICT r2 item 2).

Spawns 2 OS processes on CPU (4 virtual devices each → an 8-device
global mesh) with a localhost jax.distributed coordinator. Each process
feeds its own StreamScheduler shard; shard 1 is half the size so that
host exhausts early and pads with FILLER batches through the live
continue-flag protocol. Executes the real `jax.distributed.initialize`,
`_allreduce_max` (process_allgather), and
`make_array_from_process_local_data` paths that in-process tests only
simulate, then asserts both processes agree on the final params and the
global stats.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from kaldi_lstm_tpu.tools import make_synth_data, nnet_initialize

PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 12 <CellDim> 16 <ParamScale> 0.05 <NumStream> 8
<AffineTransform> <InputDim> 12 <OutputDim> 8 <ParamStddev> 0.1
<Softmax> <InputDim> 8 <OutputDim> 8
</NnetProto>
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _setup(work):
    # shard 0: 8 utts, shard 1: 4 utts -> host 1 exhausts early
    for pid, (n, seed) in enumerate(((8, 11), (4, 22))):
        make_synth_data.main(["--dir", os.path.join(work, f"shard{pid}"),
                              "--num-utts", str(n), "--feat-dim", "6",
                              "--num-classes", "8", "--seed", str(seed),
                              "--label-seed", "7", "--max-len", "60"])
    proto = os.path.join(work, "nnet.proto")
    with open(proto, "w") as f:
        f.write(PROTO)
    nnet_initialize.main([proto, os.path.join(work, "nnet.init")])


def _spawn(work, step_group, extra_env=None):
    port = _free_port()
    driver = os.path.join(os.path.dirname(__file__), "mp_driver.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS",
                        "XLA_FLAGS")}
    env.update(extra_env or {})
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, driver, str(pid), "2", str(port), work,
         str(step_group)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"process {pid} failed:\n{out[-4000:]}"
    return outs


def _assert_agree(work):
    p0 = np.load(os.path.join(work, "params_p0.npy"))
    p1 = np.load(os.path.join(work, "params_p1.npy"))
    # both processes must hold bit-identical gathered params
    np.testing.assert_array_equal(p0, p1)
    with open(os.path.join(work, "stats_p0.json")) as f:
        s0 = json.load(f)
    with open(os.path.join(work, "stats_p1.json")) as f:
        s1 = json.load(f)
    # loss stats are global (psum'd) — identical on every host
    assert s0["cli_avg_loss"] == pytest.approx(s1["cli_avg_loss"],
                                              abs=1e-7)
    assert s0["lib_avg_loss"] == pytest.approx(s1["lib_avg_loss"],
                                              abs=1e-7)
    assert s0["lib_frames"] == s1["lib_frames"]
    # the CLI (process 0 only) wrote the trained model
    assert os.path.getsize(os.path.join(work, "mp.nnet")) > 0
    from kaldi_lstm_tpu.models import Nnet
    Nnet.read(os.path.join(work, "mp.nnet"))


@pytest.mark.slow
def test_two_process_cpu_training(tmp_path):
    work = str(tmp_path)
    _setup(work)
    _spawn(work, step_group=1)
    _assert_agree(work)


@pytest.mark.slow
def test_two_process_cpu_training_grouped(tmp_path):
    """Same, through the grouped (dispatch-amortized) sharded step."""
    work = str(tmp_path)
    _setup(work)
    _spawn(work, step_group=2)
    _assert_agree(work)


@pytest.mark.slow
def test_two_process_cpu_training_deferred_stats(tmp_path):
    """Multi-controller run with KLT_STATS_DEFER=1 forced: the
    epoch-end single-fetch stats path must work under pjit'd global
    arrays too (the transport-bound default on the tunnel)."""
    work = str(tmp_path)
    _setup(work)
    _spawn(work, step_group=1, extra_env={"KLT_STATS_DEFER": "1"})
    _assert_agree(work)
