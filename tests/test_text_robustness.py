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
