from kaldi_lstm_tpu.parallel.mesh import (
    MeshPlan,
    make_mesh,
)
from kaldi_lstm_tpu.parallel.sharded_trainer import make_sharded_train_step
