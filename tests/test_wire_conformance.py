"""Independent wire-format conformance: parse a model file with raw
struct unpacking (no kaldi_io reuse) following the Kaldi binary spec —
guards against kaldi_io read/write errors canceling each other out in
round-trip tests."""

import struct

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.models import Nnet

PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 3 <OutputDim> 4 <CellDim> 5 <ParamScale> 0.1 <NumStream> 2
<AffineTransform> <InputDim> 4 <OutputDim> 6 <ParamStddev> 0.1
<Softmax> <InputDim> 6 <OutputDim> 6
</NnetProto>
"""


class RawParser:
    """Minimal Kaldi-binary reader written directly from the spec."""

    def __init__(self, data: bytes):
        assert data[:2] == b"\0B", "binary header"
        self.d = data
        self.pos = 2

    def token(self) -> str:
        while self.d[self.pos:self.pos + 1].isspace():
            self.pos += 1
        end = self.pos
        while not self.d[end:end + 1].isspace():
            end += 1
        tok = self.d[self.pos:end].decode()
        self.pos = end + 1  # single space terminator
        return tok

    def int32(self) -> int:
        assert self.d[self.pos:self.pos + 1] == b"\x04"
        val = struct.unpack("<i", self.d[self.pos + 1:self.pos + 5])[0]
        self.pos += 5
        return val

    def float32(self) -> float:
        assert self.d[self.pos:self.pos + 1] == b"\x04"
        val = struct.unpack("<f", self.d[self.pos + 1:self.pos + 5])[0]
        self.pos += 5
        return val

    def matrix(self) -> np.ndarray:
        assert self.token() == "FM"
        rows, cols = self.int32(), self.int32()
        n = rows * cols * 4
        arr = np.frombuffer(self.d[self.pos:self.pos + n],
                            np.float32).reshape(rows, cols)
        self.pos += n
        return arr

    def vector(self) -> np.ndarray:
        assert self.token() == "FV"
        dim = self.int32()
        arr = np.frombuffer(self.d[self.pos:self.pos + dim * 4], np.float32)
        self.pos += dim * 4
        return arr


def test_binary_model_parses_from_spec(tmp_path):
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(3))
    path = tmp_path / "m.nnet"
    nnet.write(str(path), params, binary=True)
    p = RawParser(path.read_bytes())

    assert p.token() == "<Nnet>"
    assert p.token() == "<LstmProjectedStreams>"
    assert p.int32() == 4   # output_dim
    assert p.int32() == 3   # input_dim
    assert p.token() == "<CellDim>"
    assert p.int32() == 5
    assert p.token() == "<NumStream>"
    assert p.int32() == 2
    # tensor order per the reference (…streams.h:133-150)
    lp = params[0]
    np.testing.assert_array_equal(p.matrix(), np.asarray(lp.w_gifo_x))
    np.testing.assert_array_equal(p.matrix(), np.asarray(lp.w_gifo_r))
    np.testing.assert_array_equal(p.vector(), np.asarray(lp.bias))
    np.testing.assert_array_equal(p.vector(), np.asarray(lp.peephole_i_c))
    np.testing.assert_array_equal(p.vector(), np.asarray(lp.peephole_f_c))
    np.testing.assert_array_equal(p.vector(), np.asarray(lp.peephole_o_c))
    np.testing.assert_array_equal(p.matrix(), np.asarray(lp.w_r_m))

    assert p.token() == "<AffineTransform>"
    assert p.int32() == 6 and p.int32() == 4
    assert p.token() == "<LearnRateCoef>"
    assert p.float32() == 1.0
    assert p.token() == "<BiasLearnRateCoef>"
    assert p.float32() == 1.0
    assert p.token() == "<MaxNorm>"
    assert p.float32() == 0.0
    np.testing.assert_array_equal(p.matrix(),
                                  np.asarray(params[1]["linearity"]))
    np.testing.assert_array_equal(p.vector(),
                                  np.asarray(params[1]["bias"]))

    assert p.token() == "<Softmax>"
    assert p.int32() == 6 and p.int32() == 6
    assert p.token() == "</Nnet>"


def test_int_vector_exact_upstream_bytes(tmp_path):
    """WriteIntegerVector wire bytes (base/io-funcs-inl.h): one
    element-size byte, int32 count, raw int32 payload — NO per-element
    markers."""
    import struct
    from kaldi_lstm_tpu.io.kaldi_io import (KaldiInput, KaldiOutput,
                                            read_int_vector,
                                            write_int_vector)
    import io as _io
    buf = _io.BytesIO()
    out = KaldiOutput(buf, binary=True, write_header=False)
    write_int_vector(out, [3, 1, 4])
    expect = b"\x04" + struct.pack("<i", 3) + struct.pack("<3i", 3, 1, 4)
    assert buf.getvalue() == expect
    buf.seek(0)
    got = read_int_vector(KaldiInput(buf, binary=True))
    assert list(got) == [3, 1, 4]
