"""Numerical stability on long utterances (T >> Tbptt): the cell clip
must bound the carry, activations and the full BPTT gradient must stay
finite over thousands of frames, and chunked-with-carry streaming must
equal the monolithic scan (the reference trains T=20 chunks but decodes
whole utterances, standard/nnet/nnet-lstm-projected.h:222-316)."""

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_lstm_tpu.ops import init_lstm_params, lstm_scan, zero_state


def test_long_scan_bounded_and_finite():
    T = 3000
    params = init_lstm_params(jax.random.PRNGKey(0), 5, 8, 6,
                              param_scale=0.5)  # deliberately hot init
    x = 3.0 * jax.random.normal(jax.random.PRNGKey(1), (2, T, 5))
    out, fin = lstm_scan(params, x, zero_state(2, 8, 6), cell_clip=50.0)
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(fin.c).max()) <= 50.0 + 1e-4

    def loss(p):
        o, f = lstm_scan(p, x, zero_state(2, 8, 6), cell_clip=50.0)
        return jnp.sum(o ** 2) + jnp.sum(f.c)

    grads = jax.grad(loss)(params)
    for g in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.isfinite(g).all())


def test_chunked_carry_equals_monolithic_long():
    T, chunk = 400, 20
    params = init_lstm_params(jax.random.PRNGKey(2), 4, 6, 5, 0.2)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, T, 4))
    full, fin_full = lstm_scan(params, x, zero_state(3, 6, 5))

    st = zero_state(3, 6, 5)
    outs = []
    for k in range(T // chunk):
        o, st = lstm_scan(params, x[:, k * chunk:(k + 1) * chunk], st)
        outs.append(o)
    np.testing.assert_allclose(np.concatenate(outs, 1), np.asarray(full),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st.c), np.asarray(fin_full.c),
                               rtol=2e-5, atol=2e-5)


def test_clip_engages_on_long_drift():
    """With a positive-bias cell drift the unclipped cell grows without
    bound; the clip must hold it at the limit while outputs stay sane."""
    params = init_lstm_params(jax.random.PRNGKey(4), 3, 4, 4, 0.1)
    # bias the forget gate high and input gate high -> integrator
    bias = np.asarray(params.bias).copy()
    C = 4
    bias[1 * C:3 * C] = 6.0  # i and f gates saturated on
    bias[0 * C:1 * C] = 2.0  # g positive
    params = params._replace(bias=jnp.asarray(bias))
    x = jnp.zeros((1, 2000, 3))
    _, fin_clipped = lstm_scan(params, x, zero_state(1, 4, 4),
                               cell_clip=50.0)
    assert float(jnp.abs(fin_clipped.c).max()) <= 50.0 + 1e-4
    _, fin_free = lstm_scan(params, x, zero_state(1, 4, 4),
                            cell_clip=0.0)
    assert float(jnp.abs(fin_free.c).max()) > 100.0  # clip=0 disables
