"""Collective inventory of the compiled sharded training step (VERDICT
r1 item 5): on the virtual 8-device mesh, dump the optimized HLO and
assert the communication pattern is the designed one —

* a combined gradient all-reduce covering the updatable parameters
  (replicated params -> one psum over the full mesh per leaf group);
* the fused TP xent's O(N) shard_map collectives over the model axis
  (lse/picked/argmax forward, dr/db backward);
* NOTHING quadratic: no collective payload on the order of the full
  [N_frames_global, K_senones] logits, no all-to-all / reduce-scatter /
  collective-permute surprises, bounded op count.

This pins the weak-scaling story (BENCH_NOTES "Scaling model") to an
automated check: per-step bytes over ICI stay O(params) + O(frames),
independent of the data-axis size.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.parallel import MeshPlan, make_mesh, \
    make_sharded_train_step
from kaldi_lstm_tpu.train import TrainOptions, init_momentum

PROTO = """<NnetProto>
<Transmit> <InputDim> 8 <OutputDim> 8
<LstmProjectedStreams> <InputDim> 8 <OutputDim> 8 <CellDim> 16 <ParamScale> 0.05 <NumStream> 8
<LstmProjectedStreams> <InputDim> 8 <OutputDim> 8 <CellDim> 16 <ParamScale> 0.05 <NumStream> 8
<AffineTransform> <InputDim> 8 <OutputDim> 128 <ParamStddev> 0.1
<Softmax> <InputDim> 128 <OutputDim> 128
</NnetProto>
"""

S, T, D, K = 8, 16, 8, 128   # N*K = 16384 >> ~3.5k params: the
# quadratic check has teeth (param-sized grad psums stay far below it)
DATA, MODEL = 4, 2

_SHAPE = re.compile(r"(f32|s32|u32|pred|bf16)\[([0-9,]*)\]")
_COLL = re.compile(
    r"= \(?.*?\)? ?(all-reduce|all-gather|reduce-scatter|all-to-all|"
    r"collective-permute)\(")


def _payload_elems(line: str) -> int:
    """Total elements across the (possibly tuple) result shape — the
    text before the op name."""
    head = line.split(" all-", 1)[0].split(" reduce-scatter", 1)[0] \
               .split(" collective-permute", 1)[0]
    total = 0
    for _, dims in _SHAPE.findall(head):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n
    return total


def _collective_lines(txt: str):
    return [ln.strip() for ln in txt.splitlines() if _COLL.search(ln)]


@pytest.fixture(scope="module")
def compiled():
    if len(jax.devices()) < DATA * MODEL:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=DATA, model=MODEL)
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    plan = MeshPlan(mesh, nnet)
    states = nnet.init_states(S)
    out = {}
    for name, fused in (("gspmd", False), ("fused", True)):
        step = make_sharded_train_step(
            nnet, TrainOptions(learn_rate=1e-3, momentum=0.9,
                               fused_xent=fused),
            plan, params_example=params, states_example=states)
        p = plan.place_params(jax.tree_util.tree_map(jnp.array, params))
        opt = init_momentum(p)
        st = plan.place_states(states)
        rng = np.random.RandomState(0)
        batch = plan.place_batch(
            rng.randn(S, T, D).astype(np.float32),
            rng.randint(0, K, (S, T, 1)).astype(np.int32),
            np.ones((S, T, 1), np.float32),
            np.ones((S, T), np.float32),
            np.zeros(S, np.int32))
        jitted = [c.cell_contents for c in step.__closure__
                  if callable(getattr(c.cell_contents, "lower", None))][0]
        txt = jitted.lower(p, opt, st, (), *batch, jnp.float32(1e-3),
                           None).compile().as_text()
        out[name] = (txt, _collective_lines(txt), params)
    return out


@pytest.mark.parametrize("path", ["gspmd", "fused"])
def test_no_quadratic_collectives(compiled, path):
    """No collective payload approaches the full logits [N_global, K]
    (that would be the quadratic blowup a bad TP layout produces), and
    no exotic collective kinds appear."""
    txt, lines, params = compiled[path]
    n_global_frames = S * T
    logits_elems = n_global_frames * K
    for ln in lines:
        kind = _COLL.search(ln).group(1)
        assert kind in ("all-reduce", "all-gather"), ln
        assert _payload_elems(ln) < logits_elems // 2, (
            f"collective payload ~O(N*K): {ln[:160]}")


@pytest.mark.parametrize("path,max_ops", [("gspmd", 10), ("fused", 10)])
def test_collective_op_count_bounded(compiled, path, max_ops):
    """XLA's all-reduce combiner should keep the per-step collective op
    count small and independent of parameter-tree size; a blowup here
    means per-leaf psums stopped combining (latency-bound scaling)."""
    _, lines, _ = compiled[path]
    assert 1 <= len(lines) <= max_ops, "\n".join(lines)


@pytest.mark.parametrize("path", ["gspmd", "fused"])
def test_gradient_allreduce_covers_senone_shard(compiled, path):
    """The combined gradient psum must include the senone linearity
    SHARD [K/model, R] — evidence the gradient reduction happens on the
    sharded layout (O(K/m) bytes per chip), not on a gathered [K, R]."""
    _, lines, _ = compiled[path]
    shard_shape = f"f32[{K // MODEL},8]"
    full_shape = f"f32[{K},8]"
    grad_lines = [ln for ln in lines if shard_shape in ln]
    assert grad_lines, "no gradient all-reduce over the senone shard"
    assert not any(full_shape in ln for ln in lines), (
        "a collective carries the FULL senone matrix — TP sharding lost")


def test_fused_path_has_model_axis_onf_collectives(compiled):
    """The fused TP xent's shard_map collectives reduce over the MODEL
    axis (replica groups of size 2: {{0,1},{2,3},...}) with O(N_local)
    payloads — the 3 forward combines (lse, picked, argmax) and the
    backward dr/db psums."""
    _, lines, _ = compiled["fused"]
    model_groups = "{{0,1},{2,3},{4,5},{6,7}}"
    onf = [ln for ln in lines if model_groups in ln]
    assert len(onf) >= 3, "\n".join(lines)
    # payloads are O(frames-per-data-shard), far below params size
    for ln in onf:
        assert _payload_elems(ln) <= (S * T // DATA) * (K // MODEL), ln


def test_collective_bytes_scaling_model(compiled):
    """Per-step ICI bytes: sum of collective payloads stays O(params +
    frames). With params ~9k elements here, the total must sit well
    under 10x that — the weak-scaling prediction (BENCH_NOTES) is that
    per-chip collective bytes are constant as the data axis grows."""
    for path in ("gspmd", "fused"):
        _, lines, params = compiled[path]
        n_param = sum(int(np.prod(l.shape)) for l in
                      jax.tree_util.tree_leaves(params))
        total = sum(_payload_elems(ln) for ln in lines)
        assert total < 4 * n_param, (path, total, n_param)


# ---------------------------------------------------------------------------
# Flagship-shaped payload bound (VERDICT r2 item 10): compile-only, with
# N_frames * K_senones >= 100x the parameter count, so an accidental
# O(N*K) collective (gathered logits) would overshoot the bound by two
# orders of magnitude instead of the toy shapes' ~5x margin.
# ---------------------------------------------------------------------------

FLAGSHIP_K = 16624          # the reference decode example's senone count
FS, FT, FD, FR = 1024, 16, 40, 128


@pytest.fixture(scope="module")
def compiled_flagship_shape():
    if len(jax.devices()) < DATA * MODEL:
        pytest.skip("needs 8 virtual devices")
    proto = f"""<NnetProto>
<LstmProjectedStreams> <InputDim> {FD} <OutputDim> {FR} <CellDim> 128 <ParamScale> 0.02 <NumStream> {FS}
<AffineTransform> <InputDim> {FR} <OutputDim> {FLAGSHIP_K} <ParamStddev> 0.04
<Softmax> <InputDim> {FLAGSHIP_K} <OutputDim> {FLAGSHIP_K}
</NnetProto>
"""
    mesh = make_mesh(data=DATA, model=MODEL)
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    plan = MeshPlan(mesh, nnet)
    states = nnet.init_states(FS)
    out = {}
    for name, fused in (("gspmd", False), ("fused", True)):
        step = make_sharded_train_step(
            nnet, TrainOptions(learn_rate=1e-3, momentum=0.9,
                               fused_xent=fused),
            plan, params_example=params, states_example=states)
        jitted = [c.cell_contents for c in step.__closure__
                  if callable(getattr(c.cell_contents, "lower", None))][0]
        # compile-only: abstract shapes, no arrays materialized
        p_spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
        opt_spec = init_momentum(p_spec)
        st_spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), states)
        batch_spec = (
            jax.ShapeDtypeStruct((FS, FT, FD), np.float32),
            jax.ShapeDtypeStruct((FS, FT, 1), np.int32),
            jax.ShapeDtypeStruct((FS, FT, 1), np.float32),
            jax.ShapeDtypeStruct((FS, FT), np.float32),
            jax.ShapeDtypeStruct((FS,), np.int32),
        )
        txt = jitted.lower(
            p_spec, opt_spec, st_spec, (), *batch_spec,
            jax.ShapeDtypeStruct((), np.float32),
            None).compile().as_text()
        out[name] = (txt, _collective_lines(txt), params)
    return out


@pytest.mark.parametrize("path", ["gspmd", "fused"])
def test_flagship_shape_no_quadratic_collectives(compiled_flagship_shape,
                                                 path):
    """At N*K = 272M elements vs ~2.3M params (>100x margin), every
    collective payload must stay O(params) or O(frames) — a gathered
    [N, K] logits tensor would violate this by two orders of
    magnitude."""
    txt, lines, params = compiled_flagship_shape[path]
    n_param = sum(int(np.prod(l.shape)) for l in
                  jax.tree_util.tree_leaves(params))
    nk = FS * FT * FLAGSHIP_K
    assert nk >= 100 * n_param  # the margin that gives the test teeth
    assert lines, "no collectives found — sharding silently lost?"
    bound = max(n_param, FS * FT * 4)  # O(params + frames)
    for ln in lines:
        kind = _COLL.search(ln).group(1)
        assert kind in ("all-reduce", "all-gather"), ln
        assert _payload_elems(ln) <= bound, (
            f"payload {_payload_elems(ln)} > O(params+frames) bound "
            f"{bound} (N*K={nk}): {ln[:160]}")
    total = sum(_payload_elems(ln) for ln in lines)
    assert total <= 4 * bound, (path, total, bound)
