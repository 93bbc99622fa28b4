from kaldi_lstm_tpu.utils.logging import (
    LOG,
    VLOG,
    WARN,
    get_verbose_level,
    set_verbose_level,
)
from kaldi_lstm_tpu.utils.timer import Timer
