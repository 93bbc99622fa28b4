"""The reference's three gradient versions as correctness references
(bd-nnet-lstm-projected-streams.h:388-405): variant 1 (precise) must
equal autodiff of the production forward; variants 2 (Graves) and 3
(Gers truncation) are pinned by the structural identities that define
them. Plus the per-frame DEBUG dump tool built on the same module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.ops.lstm_cell import (
    LstmState,
    init_lstm_params,
    lstm_scan,
)
from kaldi_lstm_tpu.ops.lstm_grad_variants import backward_variant

T, S, I, C, R = 7, 3, 5, 6, 4


@pytest.fixture(scope="module")
def setup():
    params = init_lstm_params(jax.random.PRNGKey(3), I, C, R,
                              param_scale=0.4)
    rng = np.random.RandomState(0)
    x = rng.randn(T, S, I).astype(np.float32)
    c0 = rng.randn(S, C).astype(np.float32) * 0.3
    r0 = rng.randn(S, R).astype(np.float32) * 0.3
    d_out = rng.randn(T, S, R).astype(np.float32)
    return params, x, c0, r0, d_out


def autodiff_grads(params, x, c0, r0, d_out):
    """jax.grad of the production scan with upstream d_out."""

    def loss(p, xx):
        r_seq, _ = lstm_scan(p, xx, LstmState(jnp.asarray(c0),
                                              jnp.asarray(r0)),
                             time_major=True)
        return jnp.sum(r_seq * jnp.asarray(d_out))

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x))
    return gp, np.asarray(gx)


def assert_grads_match(params, x, c0, r0, d_out, variant, rtol=3e-4,
                       atol=2e-4):
    _D, G = backward_variant(params, x, c0, r0, d_out, variant=variant)
    gp, gx = autodiff_grads(params, x, c0, r0, d_out)
    for name in ("w_gifo_x", "w_gifo_r", "bias", "peephole_i_c",
                 "peephole_f_c", "peephole_o_c", "w_r_m"):
        np.testing.assert_allclose(getattr(G, name),
                                   np.asarray(getattr(gp, name)),
                                   rtol=rtol, atol=atol, err_msg=name)
    np.testing.assert_allclose(G.dx, gx, rtol=rtol, atol=atol,
                               err_msg="dx")


def test_variant1_is_autodiff(setup):
    """Version 1 ('precise gradients', the live version) == jax.grad of
    the forward — both for every weight gradient and the input diff."""
    assert_grads_match(*setup, variant=1)


def test_variant1_nonzero_initial_state(setup):
    params, x, c0, r0, d_out = setup
    # also exercised above, but pin the zero-state case separately
    z = np.zeros_like
    assert_grads_match(params, x, z(c0), z(r0), d_out, variant=1)


def test_variant2_equals_v1_when_only_g_recurs(setup):
    """Graves' version backprops only the g gate to r(t): identical to
    the precise version exactly when the i/f/o recurrent weights are
    zero (their DGIFO contributions vanish)."""
    params, x, c0, r0, d_out = setup
    wr = np.asarray(params.w_gifo_r).copy()
    wr[C:] = 0.0  # keep only the g-slice rows
    p2 = params._replace(w_gifo_r=jnp.asarray(wr))
    _d1, g1 = backward_variant(p2, x, c0, r0, d_out, variant=1)
    _d2, g2 = backward_variant(p2, x, c0, r0, d_out, variant=2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    # and v2 is ALSO what autodiff produces for this weight structure
    assert_grads_match(p2, x, c0, r0, d_out, variant=2)


def test_variant3_equals_v1_when_no_recurrent_weights(setup):
    """Gers' truncation drops all gate->r backprop: identical to the
    precise version exactly when w_gifo_r == 0."""
    params, x, c0, r0, d_out = setup
    p3 = params._replace(w_gifo_r=jnp.zeros_like(params.w_gifo_r))
    _d1, g1 = backward_variant(p3, x, c0, r0, d_out, variant=1)
    _d3, g3 = backward_variant(p3, x, c0, r0, d_out, variant=3)
    for a, b in zip(g1, g3):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_variants_actually_truncate(setup):
    """On generic weights the three versions give three different input
    diffs, and truncation shrinks the early-frame gradient flow."""
    params, x, c0, r0, d_out = setup
    # error only at the last frame -> early-frame dx comes only through
    # time, where the variants differ
    d_last = np.zeros_like(d_out)
    d_last[-1] = d_out[-1]
    dxs = [backward_variant(params, x, c0, r0, d_last, variant=v)[1].dx
           for v in (1, 2, 3)]
    for a, b in ((0, 1), (0, 2), (1, 2)):
        assert np.abs(dxs[a] - dxs[b]).max() > 1e-6
    # v3's only bridge is the CEC: closing it (zero peepholes + saturated
    # forget gate off) kills early-frame gradients in v3 but not v1
    b = np.asarray(params.bias).copy()
    b[2 * C:3 * C] = -30.0  # f gate ~ 0
    pz = params._replace(bias=jnp.asarray(b),
                         peephole_i_c=jnp.zeros_like(params.peephole_i_c),
                         peephole_f_c=jnp.zeros_like(params.peephole_f_c),
                         peephole_o_c=jnp.zeros_like(params.peephole_o_c))
    z = np.zeros_like
    dx1 = backward_variant(pz, x, z(c0), z(r0), d_last, variant=1)[1].dx
    dx3 = backward_variant(pz, x, z(c0), z(r0), d_last, variant=3)[1].dx
    assert np.abs(dx3[:-1]).max() < 1e-5
    assert np.abs(dx1[:-1]).max() > 1e-4


def test_debug_dump_tool(tmp_path, capsys):
    from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter, PosteriorWriter
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.nnet_debug_dump import main as dump_main

    proto = """<NnetProto>
<LstmProjectedStreams> <InputDim> 5 <OutputDim> 4 <CellDim> 6 <ParamScale> 0.05 <NumStream> 2
<AffineTransform> <InputDim> 4 <OutputDim> 3 <ParamStddev> 0.1
<Softmax> <InputDim> 3 <OutputDim> 3
</NnetProto>
"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    mdl = tmp_path / "nnet.init"
    nnet.write(str(mdl), params)
    rng = np.random.RandomState(1)
    with MatrixWriter(f"ark:{tmp_path}/f.ark") as fw, \
            PosteriorWriter(f"ark:{tmp_path}/p.ark") as pw:
        for i in range(3):
            L = 12 + i
            fw.write(f"u{i}", rng.randn(L, 5).astype(np.float32))
            pw.write(f"u{i}", [[(int(rng.randint(3)), 1.0)]
                               for _ in range(L)])
    rc = dump_main([str(mdl), f"ark:{tmp_path}/f.ark",
                    str(tmp_path / "dump"), "--targets",
                    f"ark:{tmp_path}/p.ark", "--num-stream", "2",
                    "--batch-size", "8", "--variant", "1"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "forward-pass frame 0" in err
    assert "backward-pass frame 0" in err
    npz = np.load(tmp_path / "dump" / "layer0.<LstmProjectedStreams>.npz")
    assert npz["y_c"].shape == (8, 2, 6)
    assert npz["d_r"].shape == (8, 2, 4)
    assert np.isfinite(npz["grad_dx"]).all()
    # the dumped derivative of the real xent loss is nonzero
    assert np.abs(npz["d_r"]).max() > 0

    # the trainer CLI's --debug-dump flag drives the same dump before
    # training (the reference's DEBUG prints fire inside training)
    from kaldi_lstm_tpu.tools.train_lstm_streams import main as train_main
    rc = train_main([f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/p.ark",
                     str(mdl), str(tmp_path / "nnet.iter1"),
                     "--num-stream", "2", "--batch-size", "8",
                     "--targets-delay", "0", "--learn-rate", "1e-3",
                     "--debug-dump", str(tmp_path / "dump2")])
    assert rc == 0
    assert (tmp_path / "dump2"
            / "layer0.<LstmProjectedStreams>.npz").exists()
