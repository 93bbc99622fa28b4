"""Property tests of the multi-stream BPTT scheduler (pure host logic) —
invariants from bd-nnet-train-lstm-streams.cc:143-206."""

import numpy as np
import pytest

from kaldi_lstm_tpu.train.streams import StreamScheduler

D = 3


class DictTargets:
    def __init__(self, table):
        self.table = table

    def has_key(self, key):
        return key in self.table

    def value(self, key):
        return self.table[key]


def make_utts(lengths, seed=0):
    """Utterances whose feature row f[t, 0] = utt_index*1000 + t and
    target id = utt_index*1000 + t, so provenance is checkable."""
    rng = np.random.RandomState(seed)
    utts, targets = [], {}
    for i, L in enumerate(lengths):
        key = f"utt{i}"
        f = rng.randn(L, D).astype(np.float32)
        f[:, 0] = i * 1000 + np.arange(L)
        utts.append((key, f))
        targets[key] = [[(i * 1000 + t, 1.0)] for t in range(L)]
    return utts, DictTargets(targets)


def collect(lengths, S=2, T=4, delay=0, **kw):
    utts, targets = make_utts(lengths)
    sched = StreamScheduler(iter(utts), targets, feat_dim=D, num_stream=S,
                            batch_size=T, targets_delay=delay, **kw)
    return sched, list(sched)


def test_mask_counts_every_real_frame_exactly_once():
    lengths = [5, 9, 3, 7, 1]
    sched, batches = collect(lengths)
    total = sum(int(b.mask.sum()) for b in batches)
    assert total == sum(lengths)
    assert sched.num_done == len(lengths)


def test_frames_arrive_in_order_per_stream():
    lengths = [6, 10, 4]
    sched, batches = collect(lengths, S=2, T=4)
    # follow stream 0 across batches: masked target ids must be the
    # consecutive frames of consecutive utterances
    seen = [[] for _ in range(2)]
    for b in batches:
        for s in range(2):
            for t in range(b.mask.shape[1]):
                if b.mask[s, t] == 1:
                    seen[s].append(int(b.tgt_ids[s, t, 0]))
    for s_frames in seen:
        # within each utterance segment, ids increase by 1
        for a, bb in zip(s_frames, s_frames[1:]):
            assert bb == a + 1 or bb % 1000 == 0  # next frame or new utt


def test_reset_flag_set_exactly_when_new_utterance_starts():
    lengths = [4, 4, 4, 4]
    sched, batches = collect(lengths, S=2, T=4)
    # every batch here starts fresh utterances in both streams
    for b in batches:
        assert b.reset_flags.tolist() == [1, 1]


def test_padding_repeats_last_target_and_is_masked():
    lengths = [2]  # single short utterance, S=2 -> stream 1 empty
    sched, batches = collect(lengths, S=2, T=4)
    assert len(batches) == 1
    b = batches[0]
    # stream 0: frames 0,1 valid; 2,3 padded with last target (id 1)
    assert b.mask[0].tolist() == [1, 0, 0, 0] or \
        b.mask[0].tolist() == [1, 1, 0, 0]
    assert b.tgt_ids[0, 2, 0] == b.tgt_ids[0, 1, 0]
    # stream 1 never fed: all masked, zero feats
    assert b.mask[1].sum() == 0
    assert np.all(b.feats[1] == 0)


def test_targets_delay_shifts_features():
    lengths = [6]
    sched, batches = collect(lengths, S=1, T=6, delay=2)
    b = batches[0]
    # feat row t should be original frame min(t+2, L-1): col0 = 0*1000+src
    expect = [2, 3, 4, 5, 5, 5]
    assert [int(v) for v in b.feats[0, :, 0]] == expect
    # targets not shifted
    assert [int(v) for v in b.tgt_ids[0, :, 0]] == [0, 1, 2, 3, 4, 5]


def test_missing_targets_skipped_with_counter():
    utts, targets = make_utts([3, 3, 3])
    del targets.table["utt1"]
    sched = StreamScheduler(iter(utts), targets, feat_dim=D, num_stream=1,
                            batch_size=4)
    batches = list(sched)
    assert sched.num_no_tgt_mat == 1
    assert sched.num_done == 2
    total = sum(int(b.mask.sum()) for b in batches)
    assert total == 6


def test_length_mismatch_skipped_with_counter():
    utts, targets = make_utts([3, 3])
    targets.table["utt0"] = targets.table["utt0"][:-1]  # now length 2 != 3
    sched = StreamScheduler(iter(utts), targets, feat_dim=D, num_stream=1,
                            batch_size=4)
    list(sched)
    assert sched.num_other_error == 1
    assert sched.num_done == 1


def test_state_advances_through_padding():
    """A stream keeps consuming batches until ALL streams exhaust; its
    curt advances past lent (reference :204), so reset only happens on
    refill."""
    lengths = [2, 10]
    sched, batches = collect(lengths, S=2, T=4)
    # stream 0 finishes in batch 0; stream 1 runs 3 batches
    assert len(batches) == 3
    flags = np.stack([b.reset_flags for b in batches])
    assert flags[0].tolist() == [1, 1]
    assert flags[1].tolist() == [0, 0] and flags[2].tolist() == [0, 0]


def test_scp_mmap_fast_path(tmp_path):
    """scp reads go through zero-copy mmap views identical to ark reads,
    including unaligned offsets from odd-length keys."""
    from kaldi_lstm_tpu.io.kaldi_io import (MatrixWriter,
                                            SequentialMatrixReader,
                                            read_matrix_view,
                                            _split_offset)
    import numpy as np
    d = str(tmp_path)
    rng = np.random.RandomState(0)
    mats = {}
    with MatrixWriter(f"ark,scp:{d}/f.ark,{d}/f.scp") as w:
        for i, key in enumerate(["a", "bb", "ccc", "dddd"]):
            m = rng.randn(5 + i, 7).astype(np.float32)
            mats[key] = m
            w.write(key, m)
    got = dict(SequentialMatrixReader(f"scp:{d}/f.scp"))
    assert set(got) == set(mats)
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])
    # the fast path actually engaged (views, not copies)
    with open(f"{d}/f.scp") as f:
        line = f.readline().split()
    path, off = _split_offset(line[1])
    v = read_matrix_view(path, off)
    assert v is not None and not v.flags.owndata
    # bad offset falls back to None, not garbage
    assert read_matrix_view(path, off + 1) is None


def test_frame_weights_scale_mask():
    """--frame-weights: per-frame weights multiply the padding mask;
    missing/mismatched weight vectors skip the utterance."""
    lengths = [5, 3]
    utts, targets = make_utts(lengths)
    fw = {"utt0": np.full(5, 0.5, np.float32),
          "utt1": np.arange(1, 4, dtype=np.float32)}
    sched = StreamScheduler(iter(utts), targets, feat_dim=D, num_stream=1,
                            batch_size=4, frame_weights=fw)
    batches = list(sched)
    total = sum(float(b.mask.sum()) for b in batches)
    assert total == pytest.approx(0.5 * 5 + (1 + 2 + 3))
    # weights land on the right frames (utt0 rows all 0.5 while valid)
    b0 = batches[0]
    np.testing.assert_allclose(b0.mask[0], [0.5, 0.5, 0.5, 0.5])
    # padding frames stay exactly zero
    b1 = batches[1]
    np.testing.assert_allclose(b1.mask[0], [0.5, 0, 0, 0])


def test_frame_weights_missing_or_mismatched_skip():
    lengths = [4, 4, 4]
    utts, targets = make_utts(lengths)
    fw = {"utt0": np.ones(4, np.float32),
          # utt1 missing entirely
          "utt2": np.ones(7, np.float32)}  # wrong length
    sched = StreamScheduler(iter(utts), targets, feat_dim=D, num_stream=1,
                            batch_size=4, frame_weights=fw)
    batches = list(sched)
    assert sched.num_done == 1
    assert sched.num_other_error == 2
    assert sum(float(b.mask.sum()) for b in batches) == 4.0
