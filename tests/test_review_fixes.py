"""Regression tests for the round-1 review findings (trainer/parallel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, make_train_step
from kaldi_lstm_tpu.train.streams import StreamScheduler

SIG_PROTO = """<NnetProto>
<AffineTransform> <InputDim> 4 <OutputDim> 6 <ParamStddev> 0.3
<Sigmoid> <InputDim> 6 <OutputDim> 6
</NnetProto>
"""


def test_mse_uses_net_output_not_softmax():
    """objective='mse' on a sigmoid-tailed net: loss must be
    0.5*||sigmoid(out) - t||^2 (upstream Mse::EvalMasked on net_out)."""
    nnet, params = Nnet.init_from_proto(SIG_PROTO, jax.random.PRNGKey(0))
    S, T = 2, 3
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(S, T, 4), np.float32)
    ids = jnp.asarray(rng.randint(0, 6, (S, T, 1)), np.int32)
    w = jnp.ones((S, T, 1), np.float32)
    mask = jnp.ones((S, T), np.float32)
    flags = jnp.zeros((S,), np.int32)
    opts = TrainOptions(learn_rate=0.0, momentum=0.0, objective="mse",
                        fused_xent=False)
    step = make_train_step(nnet, opts)
    p = jax.tree_util.tree_map(jnp.array, params)
    _, _, _, aux = step(p, init_momentum(p), nnet.init_states(S), (),
                        feats, ids, w, mask, flags, jnp.float32(0.0))
    y = np.asarray(nnet.feedforward(params, feats))
    t = np.zeros_like(y)
    for s in range(S):
        for tt in range(T):
            t[s, tt, int(ids[s, tt, 0])] = 1.0
    expect = 0.5 * np.sum((y - t) ** 2)
    np.testing.assert_allclose(float(aux.xent), expect, rtol=1e-5)


def test_zero_length_utterance_skipped():
    class DictTargets:
        def __init__(self, table):
            self.table = table

        def has_key(self, key):
            return key in self.table

        def value(self, key):
            return self.table[key]

    utts = [("a", np.zeros((0, 3), np.float32)),
            ("b", np.ones((5, 3), np.float32))]
    targets = DictTargets({"a": [], "b": [[(0, 1.0)]] * 5})
    sched = StreamScheduler(iter(utts), targets, feat_dim=3,
                            num_stream=1, batch_size=4)
    batches = list(sched)  # must not crash
    assert sched.num_other_error == 1
    assert sum(float(b.mask.sum()) for b in batches) == 5.0


def test_checkpoint_roundtrip_bare_path(tmp_path):
    from kaldi_lstm_tpu.train.checkpoint import (load_train_state,
                                                 save_train_state)
    params = ({"w": jnp.arange(6.0).reshape(2, 3)},)
    opt = init_momentum(params)
    path = str(tmp_path / "iter3.state")  # no .npz suffix
    save_train_state(path, params, opt, meta={"it": 3})
    import os
    assert os.path.exists(path)
    p2, o2, meta = load_train_state(path, params)
    np.testing.assert_array_equal(np.asarray(p2[0]["w"]),
                                  np.asarray(params[0]["w"]))
    assert meta == {"it": 3}


DROP_PROTO = """<NnetProto>
<AffineTransform> <InputDim> 4 <OutputDim> 16 <ParamStddev> 0.2
<Dropout> <InputDim> 16 <OutputDim> 16 <DropoutRate> 0.5
<AffineTransform> <InputDim> 16 <OutputDim> 8 <ParamStddev> 0.2
<Softmax> <InputDim> 8 <OutputDim> 8
</NnetProto>
"""


def test_sharded_step_dropout_rng():
    """The sharded step accepts a per-step rng and dropout actually
    fires (different keys -> different updates; no key -> identity)."""
    from kaldi_lstm_tpu.parallel import (MeshPlan, make_mesh,
                                         make_sharded_train_step)
    nnet, params = Nnet.init_from_proto(DROP_PROTO, jax.random.PRNGKey(0))
    S, T = 8, 4
    mesh = make_mesh(data=4, model=2)
    plan = MeshPlan(mesh, nnet)
    states = nnet.init_states(S)
    step = make_sharded_train_step(
        nnet, TrainOptions(learn_rate=0.1, momentum=0.0), plan,
        params_example=params, states_example=states)
    rng = np.random.RandomState(0)
    batch = plan.place_batch(
        rng.randn(S, T, 4).astype(np.float32),
        rng.randint(0, 8, (S, T, 1)).astype(np.int32),
        np.ones((S, T, 1), np.float32), np.ones((S, T), np.float32),
        np.zeros(S, np.int32))

    def run(key):
        p = plan.place_params(jax.tree_util.tree_map(jnp.array, params))
        p, _, _, _ = step(p, init_momentum(p), plan.place_states(
            nnet.init_states(S)), (), *batch, jnp.float32(0.1),
            rng=key)
        return np.asarray(p[0]["linearity"])

    w1 = run(jax.random.PRNGKey(1))
    w2 = run(jax.random.PRNGKey(2))
    w_none_a = run(None)
    w_none_b = run(None)
    assert not np.allclose(w1, w2)          # dropout fired
    np.testing.assert_array_equal(w_none_a, w_none_b)  # deterministic


def test_sharded_step_rejects_odd_stream_count():
    """S not divisible by the data axis cannot shard at all; the builder
    must fail fast with an actionable message (not a cryptic GSPMD
    device_put error at the first step)."""
    from kaldi_lstm_tpu.parallel import (MeshPlan, make_mesh,
                                         make_sharded_train_step)
    PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 4 <OutputDim> 6 <CellDim> 8 <ParamScale> 0.1 <NumStream> 6
<AffineTransform> <InputDim> 6 <OutputDim> 16 <ParamStddev> 0.2
<Softmax> <InputDim> 16 <OutputDim> 16
</NnetProto>
"""
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(1))
    mesh = make_mesh(data=4, model=2)
    plan = MeshPlan(mesh, nnet)
    states = nnet.init_states(6)  # S=6, data=4
    with pytest.raises(ValueError, match="not divisible by the mesh"):
        make_sharded_train_step(
            nnet, TrainOptions(learn_rate=0.05, momentum=0.9), plan,
            params_example=params, states_example=states)


def test_mpe_forward_backward_unconnected_state():
    """States co-reachable to a final but unreachable from the start
    (untrimmed lattices) must not crash the expectation pass."""
    from kaldi_lstm_tpu.io.lattice import Lattice, LatticeArc
    from kaldi_lstm_tpu.train.sequence_lattice import (
        mpe_forward_backward, state_frames)
    lat = Lattice()
    for _ in range(4):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(1, 0, 0.0, -1.0, 1))
    lat.final[1] = (0.0, 0.0)
    # state 2 reaches final state 1 but nothing reaches state 2
    lat.arcs[2].append(LatticeArc(2, 0, 0.0, -1.0, 1))
    frames = state_frames(lat)
    assert frames[2] is None

    def acc(t, tid):
        return 1.0

    EA, post = mpe_forward_backward(lat, acc, frames)
    assert EA == pytest.approx(1.0)


def test_pipe_failure_raises():
    """A failed `cmd |` rspecifier must raise, not read as an empty
    table (upstream aborts on nonzero pipe status)."""
    from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader
    r = SequentialMatrixReader("ark:false |")
    with pytest.raises(IOError, match="pipe command failed"):
        list(r)
    # a successful pipe still works
    from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        with MatrixWriter(f"ark:{d}/m.ark") as w:
            w.write("u0", np.ones((2, 3), np.float32))
        got = dict(SequentialMatrixReader(f"ark:cat {d}/m.ark |"))
        assert list(got) == ["u0"]


def test_bigram_as_arpalm_consistent():
    from kaldi_lstm_tpu.io.arpa import ArpaBigram, bigram_as_arpalm
    bg = ArpaBigram(unigram={"a": (-1.0, -0.5), "b": (-2.0, 0.0)},
                    bigram={("a", "b"): -0.3})
    lm = bigram_as_arpalm(bg)
    assert sorted(lm.vocab) == ["a", "b"]
    assert lm.cond_logp(("a",), "b") == pytest.approx(bg.logp("a", "b"))
    # backoff path: P(a|b) = backoff(b) + P(a)
    assert lm.cond_logp(("b",), "a") == pytest.approx(bg.logp("b", "a"))


def test_text_posterior_table_large_records(tmp_path):
    """Multi-record TEXT posterior arks larger than one 8KB buffer must
    not lose framing between records (stream rewrap regression)."""
    from kaldi_lstm_tpu.io.kaldi_io import (SequentialPosteriorReader,
                                            TableWriter, write_posterior)
    rng = np.random.RandomState(0)
    table = {f"u{i:03d}": [[(int(rng.randint(0, 5000)), 1.0)]
                           for _ in range(400)]  # ~3-4 KB per record
             for i in range(40)}
    w = TableWriter(f"ark,t:{tmp_path}/p.ark", write_posterior,
                    binary=False)
    with w:
        for k, post in table.items():
            w.write(k, post)
    got = dict(SequentialPosteriorReader(f"ark:{tmp_path}/p.ark"))
    assert sorted(got) == sorted(table)
    for k in table:
        assert got[k] == table[k]


def test_dengraph_rejects_split_pdf_tuples():
    # the phone-loop Viterbi now decodes split-pdf <Tuples> models
    # exactly (per-arc emissions, tests/test_decode_viterbi.py), but the
    # dense denominator graph for sequence training still scores one pdf
    # per state and must keep refusing them
    from kaldi_lstm_tpu.decode.viterbi import PhoneLoopGraph
    from kaldi_lstm_tpu.io.transition_model import \
        make_chain_transition_model
    from kaldi_lstm_tpu.train.sequence import DenGraph

    g = PhoneLoopGraph.from_transition_model(
        make_chain_transition_model(2))
    with pytest.raises(ValueError, match="split pdfs"):
        DenGraph.from_phone_loop(g)


def test_shift_buffer_constant_memory():
    from kaldi_lstm_tpu.decode.online import _ShiftBuffer
    k = 5
    sb = _ShiftBuffer(k)
    D = 3
    rng = np.random.RandomState(0)
    x = rng.randn(47, D).astype(np.float32)
    outs = []
    for lo in range(0, 47, 4):  # uneven chunks
        outs.append(sb.push(x[lo:lo + 4]))
    outs.append(sb.flush())
    y = np.concatenate([o for o in outs if o.size])
    # TimeShift semantics: out[t] = x[min(t+k, T-1)]
    idx = np.minimum(np.arange(47) + k, 46)
    np.testing.assert_array_equal(y, x[idx])
    # no history kept beyond the last frame
    assert not hasattr(sb, "_buf")


def test_conversions_preserve_dropout_rate():
    from kaldi_lstm_tpu.models.components import (LstmProjected,
                                                  LstmProjectedStreams)
    proto = """<NnetProto>
<LstmProjectedStreams> <InputDim> 4 <OutputDim> 6 <CellDim> 8 <ParamScale> 0.1 <NumStream> 4 <DropoutRate> 0.3
<AffineTransform> <InputDim> 6 <OutputDim> 5 <ParamStddev> 0.1
<Softmax> <InputDim> 5 <OutputDim> 5
</NnetProto>
"""
    nnet, _ = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    std = nnet.to_standard()
    assert isinstance(std.components[0], LstmProjected)
    assert std.components[0].dropout_rate == pytest.approx(0.3)
    back = std.to_streams()
    assert isinstance(back.components[0], LstmProjectedStreams)
    assert back.components[0].dropout_rate == pytest.approx(0.3)


def test_scan_fallback_honors_matmul_dtype():
    """set_matmul_dtype(bf16) must affect the lax.scan path too (the
    KLT_LSTM_IMPL A/B switch compares like against like)."""
    import jax.numpy as jnp2
    from kaldi_lstm_tpu.models.components import (LstmProjectedStreams,
                                                  set_matmul_dtype)
    c = LstmProjectedStreams(6, 4, cell_dim=8)
    params = c.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 6), np.float32)
    y32, _ = c.apply(params, x, c.init_state(2))
    set_matmul_dtype(jnp2.bfloat16)
    try:
        y16, _ = c.apply(params, x, c.init_state(2))
    finally:
        set_matmul_dtype(None)
    d = float(np.max(np.abs(np.asarray(y32) - np.asarray(y16))))
    assert 0 < d < 0.05  # changed numerics (bf16 engaged), still close


def test_fbank_dither_differs_across_utterances():
    from kaldi_lstm_tpu.feats.fbank import FbankOptions, compute_fbank
    wav = (np.random.RandomState(3).randn(4000) * 500).astype(np.float32)
    opts = FbankOptions()
    f1 = compute_fbank(wav, opts)
    f2 = compute_fbank(wav, opts)
    assert not np.allclose(f1, f2)  # dither stream advances


def test_random_access_lattice_reader(tmp_path):
    from kaldi_lstm_tpu.io.lattice import (CompactLattice,
                                           CompactLatticeArc,
                                           LatticeWriter,
                                           RandomAccessLatticeReader,
                                           SequentialLatticeReader)

    def make(n):
        c = CompactLattice()
        c.add_state()
        c.add_state()
        c.arcs[0].append(CompactLatticeArc(n, 0.5, 1.0, (n, n + 1), 1))
        c.final[1] = (0.0, 0.0, ())
        return c

    with LatticeWriter(f"ark:{tmp_path}/l.ark") as w:
        for i in range(5):
            w.write(f"u{i}", make(i + 1))
    r = RandomAccessLatticeReader(f"ark:{tmp_path}/l.ark")
    assert r.has_key("u3") and not r.has_key("zz")
    ref = dict(SequentialLatticeReader(f"ark:{tmp_path}/l.ark"))
    for k in ("u4", "u0", "u2"):  # out of order
        assert r[k].arcs[0][0].label == ref[k].arcs[0][0].label
        assert r[k].arcs[0][0].tids == ref[k].arcs[0][0].tids


def test_compute_wer_present_mode_ser(tmp_path):
    from kaldi_lstm_tpu.tools.compute_wer import main as wer_main
    (tmp_path / "ref").write_text("a x y\nb x\nc z\n")
    (tmp_path / "hyp").write_text("a x y\nb q\n")  # c missing
    import contextlib, io as _io
    out = _io.StringIO()
    with contextlib.redirect_stdout(out):
        assert wer_main([str(tmp_path / "ref"), str(tmp_path / "hyp"),
                         "--mode", "present"]) == 0
    text = out.getvalue()
    # present mode: 2 scored utts, 1 sentence error (b) — c excluded
    assert "[ 1 / 2 ]" in text, text


def test_random_access_lattice_reader_scp(tmp_path):
    """scp: form with path:offset entries — lazy by offset."""
    from kaldi_lstm_tpu.io.lattice import (CompactLattice,
                                           CompactLatticeArc,
                                           LatticeWriter,
                                           RandomAccessLatticeReader,
                                           SequentialLatticeReader)

    def make(n):
        c = CompactLattice()
        c.add_state()
        c.add_state()
        c.arcs[0].append(CompactLatticeArc(n, 0.5, 1.0, (n,), 1))
        c.final[1] = (0.0, 0.0, ())
        return c

    import io as _io
    from kaldi_lstm_tpu.io.kaldi_io import _read_key
    with LatticeWriter(f"ark:{tmp_path}/l.ark") as w:
        for i in range(4):
            w.write(f"u{i}", make(i + 1))
    # build the scp by scanning the framing (offset = key start, like
    # the indexed reader; value() for scp seeks past no key, so point
    # at the record body = offset after "key ")
    scp_lines = []
    with open(f"{tmp_path}/l.ark", "rb") as f:
        while True:
            off = f.tell()
            key = _read_key(f)
            if key is None:
                break
            body = f.tell()
            scp_lines.append(f"{key} {tmp_path}/l.ark:{body}")
            from kaldi_lstm_tpu.io.lattice import _read_lattice_value
            _read_lattice_value(f, key)
    (tmp_path / "l.scp").write_text("\n".join(scp_lines) + "\n")
    r = RandomAccessLatticeReader(f"scp:{tmp_path}/l.scp")
    ref = dict(SequentialLatticeReader(f"ark:{tmp_path}/l.ark"))
    for k in ("u3", "u0"):
        assert r.has_key(k)
        assert r[k].arcs[0][0].label == ref[k].arcs[0][0].label


def test_flag_shaped_output_paths_rejected(tmp_path, monkeypatch):
    """Round-2 hygiene bug: a mis-parsed argv once wrote a model to a
    file literally named '--cross-validate=true'. Output paths that look
    like flags must be rejected, with ./ as the escape hatch."""
    from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter, check_output_path

    nnet, params = Nnet.init_from_proto(SIG_PROTO, jax.random.PRNGKey(0))
    monkeypatch.chdir(tmp_path)
    with pytest.raises(ValueError, match="flag"):
        nnet.write("--cross-validate=true", params)
    with pytest.raises(ValueError, match="flag"):
        MatrixWriter("ark:--out=x")
    with pytest.raises(ValueError, match="flag"):
        MatrixWriter("ark,scp:a.ark,--idx.scp")
    assert not list(tmp_path.iterdir())
    # escape hatch: explicit ./ prefix writes the weird name
    nnet.write("./--cross-validate=true", params)
    assert (tmp_path / "--cross-validate=true").exists()
    # '-' (stdout) is unaffected
    assert check_output_path("-") == "-"
