"""Externally-authored golden fixtures (VERDICT round-1 missing #1).

Everything under tests/data/golden/ was produced by
tools_dev/make_golden_fixtures.py, which assembles the Kaldi wire bytes
with struct.pack directly from the spec (serialization order
bd-nnet-lstm-projected-streams.h:101-150; text shape
/root/reference/README.md:32-49) and computes the numeric goldens with
an independent torch float64 implementation of the reference LSTMP
equations (…streams.h:261-325) and Xent::EvalMasked (nnet-loss.cc:76-141).
The fixtures are committed bytes — the tests NEVER regenerate them — so
reader drift, writer drift, cell drift, and loss drift each fail
independently here.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.ops import LstmState, lstm_scan
from kaldi_lstm_tpu.ops.lstm_cell import LstmParams
from kaldi_lstm_tpu.ops.lstm_pallas import lstm_scan_pallas

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden")

PARAM_KEYS = ("w_gifo_x", "w_gifo_r", "bias", "peephole_i_c",
              "peephole_f_c", "peephole_o_c", "w_r_m")


@pytest.fixture(scope="module")
def npz():
    return np.load(os.path.join(GOLDEN, "lstmp_golden.npz"))


def _check_model(nnet, params, npz):
    assert [c.token for c in nnet.components] == [
        "<Transmit>", "<LstmProjectedStreams>", "<AffineTransform>",
        "<Softmax>"]
    lstm = nnet.components[1]
    assert (lstm.input_dim, lstm.output_dim, lstm.cell_dim) == (5, 4, 6)
    p = params[1]
    for k in PARAM_KEYS:
        np.testing.assert_array_equal(
            np.asarray(getattr(p, k)), npz[f"c1_{k}"].astype(np.float32),
            err_msg=k)
    aff = nnet.components[2]
    assert aff.learn_rate_coef == 1.0 and aff.max_norm == 0.0


def test_read_frozen_binary_model(npz):
    nnet, params = Nnet.read(os.path.join(GOLDEN, "tiny_lstmp.nnet"))
    _check_model(nnet, params, npz)


def test_read_frozen_text_model(npz):
    nnet, params = Nnet.read(os.path.join(GOLDEN, "tiny_lstmp.txt"))
    _check_model(nnet, params, npz)


def test_writer_reproduces_frozen_binary_bytes(tmp_path, npz):
    """The repo WRITER must emit byte-identical output to the
    hand-assembled spec bytes — catches write-side drift that
    self-referential roundtrip tests cannot see."""
    nnet, params = Nnet.read(os.path.join(GOLDEN, "tiny_lstmp.nnet"))
    out = tmp_path / "rewritten.nnet"
    nnet.write(str(out), params, binary=True)
    frozen = open(os.path.join(GOLDEN, "tiny_lstmp.nnet"), "rb").read()
    assert out.read_bytes() == frozen


def test_read_frozen_feature_arks(npz):
    from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader
    # expected values re-derive the generator's documented deterministic
    # pattern (a fresh Pattern stream: utt1 then utt2)
    exp = {}
    with open(os.path.join(GOLDEN, "feats.ark"), "rb") as f:
        raw = f.read()
    idx = 0

    def pat(n):
        nonlocal idx
        v = ((np.arange(idx, idx + n) * 7 + 3) % 33 - 16) / 64.0
        idx += n
        return v

    exp["utt1"] = pat(4 * 5).reshape(4, 5).astype(np.float32)
    exp["utt2"] = pat(3 * 5).reshape(3, 5).astype(np.float32)

    got = dict(SequentialMatrixReader(
        "ark:" + os.path.join(GOLDEN, "feats.ark")))
    assert set(got) == {"utt1", "utt2"}
    for k in exp:
        np.testing.assert_array_equal(got[k], exp[k], err_msg=k)

    got_t = dict(SequentialMatrixReader(
        "ark:" + os.path.join(GOLDEN, "feats_text.ark")))
    for k in exp:
        np.testing.assert_array_equal(got_t[k], exp[k], err_msg="text " + k)
    assert raw[:4] == b"utt1"


def test_read_frozen_scp_offsets(tmp_path):
    """scp rxfilenames with frozen byte offsets resolve correctly."""
    from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lines = open(os.path.join(GOLDEN, "feats.scp")).read().splitlines()
    scp = tmp_path / "abs.scp"
    scp.write_text("".join(
        f"{ln.split()[0]} {os.path.join(repo_root, ln.split()[1])}\n"
        for ln in lines))
    got = dict(SequentialMatrixReader(f"scp:{scp}"))
    assert set(got) == {"utt1", "utt2"}
    assert got["utt1"].shape == (4, 5) and got["utt2"].shape == (3, 5)


def test_read_frozen_posterior_ark():
    from kaldi_lstm_tpu.io.kaldi_io import SequentialPosteriorReader
    got = dict(SequentialPosteriorReader(
        "ark:" + os.path.join(GOLDEN, "post.ark")))
    assert got["utt1"] == [[(t, 0.75), (t + 1, 0.25)] for t in range(4)]
    assert got["utt2"] == [[(2 * t, 1.0)] for t in range(3)]


def _params_from_npz(npz, case):
    return LstmParams(**{k: jnp.asarray(npz[f"{case}_{k}"], jnp.float32)
                         for k in PARAM_KEYS})


def _run_case(npz, case, scan_fn):
    p = _params_from_npz(npz, case)
    x = jnp.asarray(npz[f"{case}_x"], jnp.float32)
    st = LstmState(c=jnp.asarray(npz[f"{case}_c0"], jnp.float32),
                   r=jnp.asarray(npz[f"{case}_r0"], jnp.float32))
    gcot = jnp.asarray(npz[f"{case}_gcot"], jnp.float32)
    ccot = jnp.asarray(npz[f"{case}_ccot"], jnp.float32)
    rcot = jnp.asarray(npz[f"{case}_rcot"], jnp.float32)

    def obj(p, x, st):
        y, fin = scan_fn(p, x, st)
        return (jnp.sum(y * gcot) + jnp.sum(fin.c * ccot)
                + jnp.sum(fin.r * rcot)), (y, fin)

    (loss, (y, fin)), grads = jax.value_and_grad(
        obj, argnums=(0, 1, 2), has_aux=True)(p, x, st)
    return y, fin, grads


@pytest.mark.parametrize("case", ["c1", "c2"])
@pytest.mark.parametrize("impl", ["scan", "pallas"])
def test_lstmp_golden_forward_and_gradients(npz, case, impl):
    """Forward activations, final state, and every gradient (7 params,
    input, initial state) must match the independent torch float64
    implementation — including straight-through ±50 clip behavior in
    case c2, where the clip provably engages."""
    scan_fn = lstm_scan if impl == "scan" else (
        lambda p, x, st: lstm_scan_pallas(p, x, st, interpret=True))
    y, fin, (gp, gx, gst) = _run_case(npz, case, scan_fn)

    np.testing.assert_allclose(y, npz[f"{case}_g_y"], atol=3e-5, rtol=2e-4)
    np.testing.assert_allclose(fin.c, npz[f"{case}_g_final_c"],
                               atol=3e-5, rtol=2e-4)
    np.testing.assert_allclose(fin.r, npz[f"{case}_g_final_r"],
                               atol=3e-5, rtol=2e-4)
    if case == "c2":
        # the clip must actually pin cells at exactly ±50
        assert np.any(np.asarray(fin.c) == 50.0)
    for k in PARAM_KEYS:
        np.testing.assert_allclose(
            np.asarray(getattr(gp, k)), npz[f"{case}_g_d_{k}"],
            atol=5e-5, rtol=5e-4, err_msg=f"{case} d_{k}")
    np.testing.assert_allclose(gx, npz[f"{case}_g_d_x"],
                               atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(gst.c, npz[f"{case}_g_d_c0"],
                               atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(gst.r, npz[f"{case}_g_d_r0"],
                               atol=5e-5, rtol=5e-4)


def test_masked_xent_golden(npz):
    """masked_xent_loss (value, gradient, frame accuracy, entropy,
    frame count) vs the independent torch implementation, including a
    masked-out frame and a weight-2 frame."""
    from kaldi_lstm_tpu.train.loss import masked_xent_loss
    logits = jnp.asarray(npz["xe_logits"], jnp.float32)
    ids = jnp.asarray(npz["xe_ids"], jnp.int32)[:, None, :]  # [N,1,K]
    tw = jnp.asarray(npz["xe_tw"], jnp.float32)[:, None, :]
    mask = jnp.asarray(npz["xe_mask"], jnp.float32)[:, None]

    def f(z):
        return masked_xent_loss(z[:, None, :], ids, tw, mask)

    loss_v, aux = f(logits)
    dz = jax.grad(lambda z: f(z)[0])(logits)
    np.testing.assert_allclose(float(loss_v), npz["xe_g_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(dz, npz["xe_g_d_logits"],
                               atol=1e-5, rtol=1e-4)
    assert float(aux.correct) == float(npz["xe_g_correct"])
    np.testing.assert_allclose(float(aux.entropy), npz["xe_g_entropy"],
                               rtol=1e-5)
    assert float(aux.frames) == float(npz["xe_g_frames"])


def test_fused_xent_kernel_vs_golden(npz):
    """The fused affine+softmax+xent kernel against the independent
    golden: r = logits, W = identity, b = 0 makes the kernel's logits
    equal the frozen ones."""
    from kaldi_lstm_tpu.ops.xent_pallas import fused_affine_xent
    logits = jnp.asarray(npz["xe_logits"], jnp.float32)
    N, K = logits.shape
    w = jnp.eye(K, dtype=jnp.float32)
    b = jnp.zeros((K,), jnp.float32)
    ids = jnp.asarray(npz["xe_ids"], jnp.int32)
    tw = jnp.asarray(npz["xe_tw"], jnp.float32)
    mask = jnp.asarray(npz["xe_mask"], jnp.float32)

    def f(r):
        return fused_affine_xent(r, w, b, ids, tw, mask, True)

    loss_v, aux = f(logits)
    dr = jax.grad(lambda r: f(r)[0])(logits)
    np.testing.assert_allclose(float(loss_v), npz["xe_g_loss"], rtol=1e-5)
    np.testing.assert_allclose(dr, npz["xe_g_d_logits"],
                               atol=1e-5, rtol=1e-4)
    assert float(aux.correct) == float(npz["xe_g_correct"])
    assert float(aux.frames) == float(npz["xe_g_frames"])
