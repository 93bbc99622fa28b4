"""Text-format parser robustness: odd whitespace, scientific notation,
CRLF, extra blank lines — shapes a hand-edited model file can take
(model surgery by text editing is a first-class workflow in the
reference, README.md Q1/Q2)."""

import io

import numpy as np

from kaldi_lstm_tpu.io import kaldi_io as kio
from kaldi_lstm_tpu.models import Nnet


def parse(text: str):
    return Nnet.read_stream(io.BufferedReader(io.BytesIO(text.encode())))


def test_hand_edited_style_model():
    text = """<Nnet>
<TimeShift>   40 40   <Shift>   5
<AddShift> 40 40
 [ -1.0   2.5e-1 -3.125E+0 0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16
   17 18 19 20 21 22 23 24 25 26 27 28 29 30 31 32 33 34 35 36 ]
<Softmax>\t40\t40
</Nnet>
"""
    nnet, params = parse(text)
    assert [c.token for c in nnet.components] == \
        ["<TimeShift>", "<AddShift>", "<Softmax>"]
    assert nnet.components[0].shift == 5
    shift = np.asarray(params[1]["shift"])
    assert shift.shape == (40,)
    np.testing.assert_allclose(shift[:3], [-1.0, 0.25, -3.125])


def test_crlf_line_endings():
    text = ("<Nnet>\r\n<AddShift> 3 3\r\n [ 1 2 3 ]\r\n"
            "<Rescale> 3 3\r\n [ 4 5 6 ]\r\n</Nnet>\r\n")
    nnet, params = parse(text)
    np.testing.assert_allclose(np.asarray(params[0]["shift"]), [1, 2, 3])
    np.testing.assert_allclose(np.asarray(params[1]["scale"]), [4, 5, 6])


def test_matrix_rows_with_ragged_whitespace():
    text = ("<Nnet>\n<AffineTransform> 2 3\n"
            "<LearnRateCoef> 1 <BiasLearnRateCoef> 1 <MaxNorm> 0  [\n"
            "    1 2 3   \n"
            "\t4\t5\t6 ]\n"
            " [ 0.5 -0.5 ]\n</Nnet>\n")
    nnet, params = parse(text)
    np.testing.assert_allclose(np.asarray(params[0]["linearity"]),
                               [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_allclose(np.asarray(params[0]["bias"]), [0.5, -0.5])


def test_end_of_component_markers_tolerated():
    text = ("<Nnet>\n<AddShift> 2 2\n [ 1 2 ]\n<!EndOfComponent>\n"
            "<Softmax> 2 2\n<!EndOfComponent>\n</Nnet>\n")
    nnet, params = parse(text)
    assert len(nnet) == 2


def test_fuzz_text_roundtrip_randomized():
    """Seeded fuzz: random nets written in text mode, reparsed after
    random-but-legal whitespace mutations (tabs, CRLF, blank lines,
    extra spacing) — values must survive exactly; the transition-model
    text parser gets the same treatment."""
    import random

    import jax

    from kaldi_lstm_tpu.io.kaldi_io import KaldiInput, KaldiOutput
    from kaldi_lstm_tpu.io.transition_model import (
        TransitionModel,
        make_monophone_transition_model,
    )

    rng = random.Random(1234)

    def mutate(text: str) -> str:
        out = []
        for line in text.split("\n"):
            if rng.random() < 0.2:
                out.append("")  # blank line
            if rng.random() < 0.3:
                line = line.replace(" ", "  ")
            if rng.random() < 0.2:
                line = "\t" + line + " "
            out.append(line)
        sep = "\r\n" if rng.random() < 0.3 else "\n"
        return sep.join(out)

    protos = [
        "<NnetProto>\n<LstmProjectedStreams> <InputDim> 5 <OutputDim> 4 "
        "<CellDim> 6 <ParamScale> 0.1 <NumStream> 2\n"
        "<AffineTransform> <InputDim> 4 <OutputDim> 7\n"
        "<Softmax> <InputDim> 7 <OutputDim> 7\n</NnetProto>",
        "<NnetProto>\n<TimeShift> <InputDim> 5 <OutputDim> 5 <Shift> 3\n"
        "<Splice> <InputDim> 5 <OutputDim> 15 <BuildVector> -1 0 1 "
        "</BuildVector>\n"
        "<AffineTransform> <InputDim> 15 <OutputDim> 4\n"
        "<Sigmoid> <InputDim> 4 <OutputDim> 4\n</NnetProto>",
    ]
    for trial, proto in enumerate(protos * 3):
        nnet, params = Nnet.init_from_proto(proto,
                                            jax.random.PRNGKey(trial))
        buf = io.BytesIO()
        nnet.write_stream(buf, params, binary=False)
        text = mutate(buf.getvalue().decode())
        nnet2, params2 = parse(text)
        assert [c.token for c in nnet2.components] == \
            [c.token for c in nnet.components]
        import jax.tree_util as jtu
        for a, b in zip(jtu.tree_leaves(params), jtu.tree_leaves(params2)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-7)

    for trial in range(4):
        tm = make_monophone_transition_model(3 + trial % 2, 2)
        buf = io.BytesIO()
        tm.write(KaldiOutput(buf, binary=False))
        text = mutate(buf.getvalue().decode())
        tm2 = TransitionModel.read(
            KaldiInput(io.BufferedReader(io.BytesIO(text.encode()))))
        assert tm2.tuples == tm.tuples
        np.testing.assert_array_equal(tm2.id2pdf, tm.id2pdf)


def test_truncated_and_garbage_models_raise():
    """Corrupt inputs must raise a clean error, not crash or hang."""
    import pytest

    cases = [
        "<Nnet>\n<AddShift> 3 3\n [ 1 2 ",          # unterminated vector
        "<Nnet>\n<NoSuchComponent> 3 3\n</Nnet>",   # unknown marker
        "<Nnet>\n<TimeShift> 3 3 <Shift>",          # missing value
    ]
    for text in cases:
        with pytest.raises(Exception):
            parse(text)


def test_truncated_int_vector_raises_cleanly(tmp_path):
    """Binary alignment records cut mid-payload raise, never return
    short garbage."""
    import io as _io
    import struct
    import pytest
    from kaldi_lstm_tpu.io.kaldi_io import (KaldiInput, KaldiOutput,
                                            read_int_vector,
                                            write_int_vector)
    buf = _io.BytesIO()
    write_int_vector(KaldiOutput(buf, binary=True, write_header=False),
                     list(range(100)))
    raw = buf.getvalue()
    for cut in (3, 20, len(raw) - 1):
        with pytest.raises((EOFError, ValueError)):
            read_int_vector(KaldiInput(_io.BytesIO(raw[:cut]),
                                       binary=True))


def test_malformed_posterior_ark_clean_error(tmp_path):
    """A corrupt binary posterior ark (negative counts) must raise a
    clean Python error through both the native and fallback parsers,
    never crash or loop."""
    import struct
    import pytest
    from kaldi_lstm_tpu.io.kaldi_io import RandomAccessPosteriorReader
    # key + \0B + T=2 then a NEGATIVE per-frame count
    rec = (b"u0 \0B" + b"\x04" + struct.pack("<i", 2)
           + b"\x04" + struct.pack("<i", -5))
    p = tmp_path / "bad.ark"
    p.write_bytes(rec)
    with pytest.raises((ValueError, EOFError, struct.error)):
        r = RandomAccessPosteriorReader(f"ark:{p}")
        if r.has_key("u0"):
            r.value("u0")


def test_truncated_wav_ark_record(tmp_path):
    import pytest
    from kaldi_lstm_tpu.io.wav import (SequentialWaveReader, WaveWriter,
                                       wav_bytes)
    import numpy as np
    full = wav_bytes(8000.0, np.zeros(1000, np.float32))
    (tmp_path / "w.ark").write_bytes(b"u0 " + full[:len(full) // 2])
    with pytest.raises(EOFError):
        list(SequentialWaveReader(f"ark:{tmp_path}/w.ark"))
