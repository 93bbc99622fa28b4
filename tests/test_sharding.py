"""Multi-device sharding tests on the 8-device virtual CPU mesh:
data-parallel streams + tensor-parallel senone layer must produce the
same numbers as single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.parallel import MeshPlan, make_mesh, \
    make_sharded_train_step
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, \
    make_train_step

PROTO = """<NnetProto>
<LstmProjectedStreams> <InputDim> 6 <OutputDim> 8 <CellDim> 16 <ParamScale> 0.1 <NumStream> 8
<AffineTransform> <InputDim> 8 <OutputDim> 32 <ParamStddev> 0.1
<Softmax> <InputDim> 32 <OutputDim> 32
</NnetProto>
"""

S, T = 8, 5


def make_batch(seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(S, T, 6).astype(np.float32)
    ids = rng.randint(0, 32, (S, T, 1)).astype(np.int32)
    w = np.ones((S, T, 1), np.float32)
    mask = np.ones((S, T), np.float32)
    mask[0, 3:] = 0
    flags = np.zeros(S, np.int32)
    flags[1] = 1
    return feats, ids, w, mask, flags


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    return nnet, params


def copy_tree(t):
    return jax.tree_util.tree_map(lambda x: jnp.array(x), t)


def run_reference(nnet, params, nsteps=3):
    params = copy_tree(params)  # steps donate their input buffers
    opts = TrainOptions(learn_rate=0.05, momentum=0.9)
    step = make_train_step(nnet, opts)
    opt = init_momentum(params)
    states = nnet.init_states(S)
    for i in range(nsteps):
        feats, ids, w, mask, flags = make_batch(seed=i)
        params, opt, states, aux = step(
            params, opt, states, (), jnp.asarray(feats), jnp.asarray(ids),
            jnp.asarray(w), jnp.asarray(mask), jnp.asarray(flags),
            jnp.float32(0.05))
    return params, aux


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_step_matches_single_device(setup, data, model):
    nnet, params0 = setup
    ref_params, ref_aux = run_reference(nnet, params0)

    mesh = make_mesh(data=data, model=model)
    plan = MeshPlan(mesh, nnet)
    states = nnet.init_states(S)
    step = make_sharded_train_step(
        nnet, TrainOptions(learn_rate=0.05, momentum=0.9), plan,
        params_example=params0, states_example=states)

    params = plan.place_params(copy_tree(params0))
    opt = init_momentum(params)
    states = plan.place_states(states)
    for i in range(3):
        batch = plan.place_batch(*make_batch(seed=i))
        params, opt, states, aux = step(params, opt, states, (), *batch,
                                        jnp.float32(0.05))

    if model > 1:
        # TP layer really sharded: senone affine is split over 'model'
        lin = params[1]["linearity"]
        assert len(lin.sharding.device_set) == 8
        assert not lin.sharding.is_fully_replicated

    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    assert int(aux.frames) == int(ref_aux.frames)
    assert int(aux.correct) == int(ref_aux.correct)
    np.testing.assert_allclose(float(aux.xent), float(ref_aux.xent),
                               rtol=1e-4)


def test_sharded_step_l2_and_max_norm_matches(setup):
    """Regularized update (l2 penalty + per-leaf lr-scale machinery)
    agrees between the sharded and single-device steps."""
    nnet, params0 = setup
    opts = TrainOptions(learn_rate=0.05, momentum=0.9, l2_penalty=0.01)

    params = copy_tree(params0)
    step = make_train_step(nnet, opts)
    opt = init_momentum(params)
    states = nnet.init_states(S)
    for i in range(2):
        feats, ids, w, mask, flags = make_batch(seed=i)
        params, opt, states, _ = step(
            params, opt, states, (), jnp.asarray(feats), jnp.asarray(ids),
            jnp.asarray(w), jnp.asarray(mask), jnp.asarray(flags),
            jnp.float32(0.05))
    ref_params = params

    mesh = make_mesh(data=4, model=2)
    plan = MeshPlan(mesh, nnet)
    states = nnet.init_states(S)
    sstep = make_sharded_train_step(nnet, opts, plan,
                                    params_example=params0,
                                    states_example=states)
    params = plan.place_params(copy_tree(params0))
    opt = init_momentum(params)
    states = plan.place_states(states)
    for i in range(2):
        batch = plan.place_batch(*make_batch(seed=i))
        params, opt, states, _ = sstep(params, opt, states, (), *batch,
                                       jnp.float32(0.05))

    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
