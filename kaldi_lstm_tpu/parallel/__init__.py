from kaldi_lstm_tpu.parallel.mesh import (
    MeshPlan,
    make_mesh,
)
from kaldi_lstm_tpu.parallel.sharded_trainer import (
    make_sharded_grouped_train_step,
    make_sharded_train_step,
)
from kaldi_lstm_tpu.parallel.multihost import (
    SyncedScheduler,
    count_batches,
    empty_batch,
    shard_batch_to_mesh,
    shard_group_to_mesh,
)
