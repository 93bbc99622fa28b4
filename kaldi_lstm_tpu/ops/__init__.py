from kaldi_lstm_tpu.ops.lstm_cell import (
    LstmParams,
    LstmState,
    init_lstm_params,
    lstm_scan,
    lstm_step,
    zero_state,
)
