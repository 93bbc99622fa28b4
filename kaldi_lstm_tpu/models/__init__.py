from kaldi_lstm_tpu.models.components import (
    AddShift,
    AffineTransform,
    Component,
    LstmProjected,
    LstmProjectedStreams,
    Rescale,
    Softmax,
    TimeShift,
    Transmit,
    component_from_token,
)
from kaldi_lstm_tpu.models.nnet import Nnet
