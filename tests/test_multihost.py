"""Multi-host support logic: batch-count simulation matches the real
scheduler; synced padding keeps step counts aligned; empty batches are
gradient/stat no-ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.parallel.multihost import (
    SyncedScheduler,
    count_batches,
    empty_batch,
)
from kaldi_lstm_tpu.train import StreamScheduler, TrainOptions, \
    init_momentum, make_train_step
from tests.test_streams import make_utts


def make_sched(lengths, S=2, T=4, **kw):
    utts, targets = make_utts(lengths)
    return StreamScheduler(iter(utts), targets, feat_dim=3, num_stream=S,
                           batch_size=T, targets_delay=0, **kw)


@pytest.mark.parametrize("lengths,S,T", [
    ([5, 9, 3, 7, 1], 2, 4),
    ([6, 10, 4], 2, 4),
    ([4, 4, 4, 4], 2, 4),
    ([2], 2, 4),
    ([2, 10], 2, 4),
    ([17, 3, 8, 1, 1, 25], 3, 5),
    ([], 2, 4),
])
def test_count_batches_matches_real_scheduler(lengths, S, T):
    real = len(list(make_sched(lengths, S, T)))
    assert count_batches(lengths, S, T) == real


def test_synced_scheduler_pads_to_target():
    sched = make_sched([5, 9, 3])
    synced = SyncedScheduler(sched, agree_fn=lambda local: local + 3)
    batches = list(synced)
    assert len(batches) == synced.target_steps
    for b in batches[-3:]:
        assert b.mask.sum() == 0
        assert b.reset_flags.sum() == 0


def test_synced_scheduler_lengths_mode():
    lengths = [5, 9, 3, 7]
    sched = make_sched(lengths)
    synced = SyncedScheduler(sched, agree_fn=lambda l: l,
                             lengths=lengths)
    batches = list(synced)
    assert len(batches) == count_batches(lengths, 2, 4)
    total = sum(int(b.mask.sum()) for b in batches)
    assert total == sum(lengths)


def test_empty_batch_is_training_noop():
    """An empty batch leaves params identical and adds zero stats (so
    trailing hosts only spin the allreduce)."""
    proto = ("<NnetProto>\n"
             "<LstmProjectedStreams> <InputDim> 3 <OutputDim> 4 "
             "<CellDim> 5 <NumStream> 2\n"
             "<AffineTransform> <InputDim> 4 <OutputDim> 6\n"
             "<Softmax> <InputDim> 6 <OutputDim> 6\n</NnetProto>")
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    step = make_train_step(nnet, TrainOptions(learn_rate=0.1, momentum=0.9))
    opt = init_momentum(params)
    states = nnet.init_states(2)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params)
    b = empty_batch(2, 4, 3, 1)
    params2, opt2, states2, aux = step(
        params, opt, states, (), jnp.asarray(b.feats),
        jnp.asarray(b.tgt_ids), jnp.asarray(b.tgt_weights),
        jnp.asarray(b.mask), jnp.asarray(b.reset_flags), jnp.float32(0.1))
    for a, c in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(a, np.asarray(c))
    assert int(aux.frames) == 0 and float(aux.xent) == 0.0
