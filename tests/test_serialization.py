"""Round-trip and format tests for Kaldi-token nnet serialization
(format per SURVEY.md §3.4)."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.io import kaldi_io as kio
from kaldi_lstm_tpu.models import Nnet

PROTO = """<NnetProto>
<Transmit> <InputDim> 10 <OutputDim> 10
<LstmProjectedStreams> <InputDim> 10 <OutputDim> 8 <CellDim> 12 <ParamScale> 0.01 <NumStream> 4
<AffineTransform> <InputDim> 8 <OutputDim> 20 <BiasMean> 0.0 <BiasRange> 0.0 <ParamStddev> 0.04
<Softmax> <InputDim> 20 <OutputDim> 20
</NnetProto>
"""


def build():
    return Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))


def roundtrip(nnet, params, binary):
    buf = io.BytesIO()
    nnet.write_stream(buf, params, binary=binary)
    buf.seek(0)
    return Nnet.read_stream(io.BufferedReader(buf))


def assert_params_equal(pa, pb):
    fa = jax.tree_util.tree_leaves(pa)
    fb = jax.tree_util.tree_leaves(pb)
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_proto_init_structure():
    nnet, params = build()
    assert len(nnet) == 4
    assert nnet.input_dim == 10 and nnet.output_dim == 20
    lstm = nnet.components[1]
    assert lstm.cell_dim == 12 and lstm.nstream == 4
    p = params[1]
    assert p.w_gifo_x.shape == (48, 10)
    assert p.w_r_m.shape == (8, 12)
    assert float(jnp.max(jnp.abs(p.w_gifo_x))) <= 0.01


def test_binary_roundtrip():
    nnet, params = build()
    nnet2, params2 = roundtrip(nnet, params, binary=True)
    assert [c.token for c in nnet2.components] == \
        [c.token for c in nnet.components]
    assert_params_equal(params, params2)
    assert nnet2.components[1].cell_dim == 12
    assert nnet2.components[1].nstream == 4


def test_text_roundtrip():
    nnet, params = build()
    nnet2, params2 = roundtrip(nnet, params, binary=False)
    assert_params_equal(params, params2)


def test_text_matches_reference_shape():
    """Text serialization should look like the README example:
    `<LstmProjectedStreams> 8 10 <CellDim> 12 <NumStream> 4 ...`"""
    nnet, params = build()
    buf = io.BytesIO()
    nnet.write_stream(buf, params, binary=False)
    text = buf.getvalue().decode()
    assert text.startswith("<Nnet>")
    assert "<Transmit> 10 10" in text
    assert "<LstmProjectedStreams> 8 10 <CellDim> 12 <NumStream> 4" in text
    assert "<AffineTransform> 20 8 <LearnRateCoef>" in text
    assert "<Softmax> 20 20" in text
    assert text.rstrip().endswith("</Nnet>")


def test_binary_matrix_wire_format():
    """FM + \\x04-size-marked int32 dims + row-major f32 payload."""
    buf = io.BytesIO()
    out = kio.KaldiOutput(buf, binary=True)
    m = np.arange(6, dtype=np.float32).reshape(2, 3)
    kio.write_matrix(out, m)
    raw = buf.getvalue()
    assert raw.startswith(b"\0BFM \x04\x02\x00\x00\x00\x04\x03\x00\x00\x00")
    assert raw[15:] == m.tobytes()


def test_propagate_after_roundtrip_identical():
    nnet, params = build()
    nnet2, params2 = roundtrip(nnet, params, binary=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 10))
    states = nnet.init_states(4)
    y1, _ = nnet.propagate(params, x, states)
    y2, _ = nnet2.propagate(params2, x, nnet2.init_states(4))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-6, atol=1e-7)


def test_to_standard_conversion():
    nnet, params = build()
    std = nnet.to_standard()
    toks = [c.token for c in std.components]
    assert toks == ["<TimeShift>", "<LstmProjected>",
                    "<AffineTransform>", "<Softmax>"]
    # same params load: forward on one stream with zero state matches
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 10))
    y1, _ = nnet.propagate(params, x, nnet.init_states(1))
    y2, _ = std.propagate(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-6, atol=1e-7)


def test_reset_states_masks_rows():
    nnet, params = build()
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 5, 10))
    _, states = nnet.propagate(params, x, nnet.init_states(4))
    flags = jnp.array([1, 0, 1, 0])
    reset = nnet.reset_states(states, flags)
    st = reset[1]  # the LSTM component state
    assert float(jnp.max(jnp.abs(st.c[0]))) == 0.0
    assert float(jnp.max(jnp.abs(st.c[2]))) == 0.0
    np.testing.assert_allclose(st.c[1], states[1].c[1])
