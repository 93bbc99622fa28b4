from kaldi_lstm_tpu.train.loss import (
    LossStats,
    masked_mse_loss,
    masked_xent_loss,
    posterior_to_sparse,
)
from kaldi_lstm_tpu.train.optim import (
    MomentumState,
    init_momentum,
    momentum_update,
)
from kaldi_lstm_tpu.train.streams import StreamScheduler, StreamBatch
from kaldi_lstm_tpu.train.trainer import (
    TrainOptions,
    make_train_step,
    run_epoch,
)
