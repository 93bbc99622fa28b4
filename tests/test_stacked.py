"""Stacked multi-layer LSTM state carry: chunked propagation with carry
must equal whole-sequence propagation (2-layer google config, README Q2),
and serialization bytes stay pinned for a tiny golden model."""

import hashlib
import io

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models import Nnet

PROTO2 = """<NnetProto>
<Transmit> <InputDim> 5 <OutputDim> 5
<LstmProjectedStreams> <InputDim> 5 <OutputDim> 6 <CellDim> 8 <ParamScale> 0.1 <NumStream> 3
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 6 <CellDim> 8 <ParamScale> 0.1 <NumStream> 3
<AffineTransform> <InputDim> 6 <OutputDim> 4 <ParamStddev> 0.1
<Softmax> <InputDim> 4 <OutputDim> 4
</NnetProto>
"""


def test_two_layer_carry_equals_full_run():
    nnet, params = Nnet.init_from_proto(PROTO2, jax.random.PRNGKey(0))
    S, T = 3, 12
    x = jax.random.normal(jax.random.PRNGKey(1), (S, T, 5))

    y_full, st_full = nnet.propagate(params, x, nnet.init_states(S))

    states = nnet.init_states(S)
    outs = []
    for k in range(0, T, 4):
        y, states = nnet.propagate(params, x[:, k:k + 4], states)
        outs.append(y)
    np.testing.assert_allclose(np.concatenate(outs, 1), np.asarray(y_full),
                               rtol=1e-5, atol=1e-6)
    # both layer states carried
    assert states[1] is not None and states[2] is not None
    np.testing.assert_allclose(states[1].c, st_full[1].c, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(states[2].c, st_full[2].c, rtol=1e-5,
                               atol=1e-6)


def test_reset_only_clears_selected_streams_all_layers():
    nnet, params = Nnet.init_from_proto(PROTO2, jax.random.PRNGKey(0))
    S = 3
    x = jax.random.normal(jax.random.PRNGKey(2), (S, 6, 5))
    _, states = nnet.propagate(params, x, nnet.init_states(S))
    reset = nnet.reset_states(states, jnp.array([0, 1, 0]))
    for li in (1, 2):
        assert float(jnp.abs(reset[li].c[1]).max()) == 0.0
        assert float(jnp.abs(reset[li].r[1]).max()) == 0.0
        np.testing.assert_array_equal(np.asarray(reset[li].c[0]),
                                      np.asarray(states[li].c[0]))


def test_golden_serialization_bytes_stable():
    """Wire-format stability guard: the exact bytes of a deterministic
    tiny model must not drift (reference cross-compat depends on it).
    If this changes INTENTIONALLY, update the digest and re-verify
    against the Kaldi format spec (SURVEY.md §3.4)."""
    proto = ("<NnetProto>\n"
             "<TimeShift> <InputDim> 2 <OutputDim> 2 <Shift> 1\n"
             "<LstmProjected> <InputDim> 2 <OutputDim> 2 <CellDim> 3 "
             "<ParamScale> 0.1\n"
             "<Softmax> <InputDim> 2 <OutputDim> 2\n"
             "</NnetProto>")
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(7))
    # zero out params for byte determinism independent of RNG impl
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    buf = io.BytesIO()
    nnet.write_stream(buf, params, binary=True)
    raw = buf.getvalue()
    assert raw.startswith(b"\0B<Nnet> <TimeShift> ")
    assert b"<LstmProjected> " in raw and b"<CellDim> " in raw
    digest = hashlib.sha256(raw).hexdigest()
    assert digest == "6fa089cb233a94cf65b906f4934b8b916258251828ca1869f4d91a5a3e2445d3", (
        f"serialization bytes drifted: {digest} ({len(raw)} bytes)")
