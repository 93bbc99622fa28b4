"""Device-time attribution of serial vs wavefront 2xLSTMP forward:
the wall-clock A/B (bench_wavefront.py) carries ~1.2 ms/call of harness
overhead, so kernel-level truth needs the profiler.

Usage: python tools_dev/profile_wavefront.py [S] [G] [mode]
  mode: serial | wave | both (default both)
"""

import shutil
import sys

import jax
import jax.numpy as jnp

import os as _os
_sys_path_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, _sys_path_root)
sys.path.insert(0, _os.path.join(_sys_path_root, "tools_dev"))

from profile_step import parse  # noqa: E402

mode = sys.argv[3] if len(sys.argv) > 3 else "both"
# bench_wavefront parses argv at import: give it only [S, G, reps=1]
sys.argv = [sys.argv[0]] + sys.argv[1:3] + ["1"]
import bench_wavefront as bw    # noqa: E402


def profile(name, fn, *args, iters=3):
    @jax.jit
    def grouped(x):
        def body(xc, _):
            out, _res = fn(xc, *args)
            xc = xc + 0.0 * jnp.sum(out)
            return xc, jnp.sum(out)
        xc, sums = jax.lax.scan(body, x, None, length=bw.G)
        return xc, jnp.sum(sums)

    xc, chk = grouped(bw.x0)
    float(chk)
    td = f"/tmp/klt_profile_{name}"
    shutil.rmtree(td, ignore_errors=True)
    with jax.profiler.trace(td):
        for _ in range(iters):
            xc, chk = grouped(xc)
        float(chk)
    print(f"=== {name} (per kernel call) ===", flush=True)
    parse(td, iters, bw.G)


if mode in ("serial", "both"):
    profile("serial", bw.serial_fwd, 5)
if mode in ("wave", "both"):
    profile("wave", bw.wave_fwd, 5)
if mode == "one":
    profile("one_layer", bw.serial_one_layer, 5)
