"""Flagship-scale convergence check on the real TPU: train the google
config (40 -> LSTMP 800c/512r -> senones) on a structured synthetic task
and verify frame accuracy climbs far above chance. This is the
end-to-end 'it actually learns at scale on the chip' gate."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.train import TrainOptions, init_momentum, \
    make_train_step

S, T, I, K = 64, 20, 40, 1000

PROTO = f"""<NnetProto>
<Transmit> <InputDim> {I} <OutputDim> {I}
<LstmProjectedStreams> <InputDim> {I} <OutputDim> 512 <CellDim> 800 <ParamScale> 0.01 <NumStream> {S}
<AffineTransform> <InputDim> 512 <OutputDim> {K} <ParamStddev> 0.04
<Softmax> <InputDim> {K} <OutputDim> {K}
</NnetProto>"""


def run(nsteps=2000, bf16=False):
    from kaldi_lstm_tpu.models.components import set_matmul_dtype
    set_matmul_dtype(jnp.bfloat16 if bf16 else None)
    rng = np.random.RandomState(0)
    # structured task: label depends on a random linear map of the input
    # plus the PREVIOUS frame (so the recurrence matters)
    W1 = rng.randn(I, K)
    W2 = rng.randn(I, K)

    nnet, params = Nnet.init_from_proto(PROTO, jax.random.PRNGKey(0))
    opts = TrainOptions(learn_rate=1e-4, momentum=0.9)
    step = make_train_step(nnet, opts)
    opt = init_momentum(params)
    states = nnet.init_states(S)
    flags0 = jnp.ones((S,), jnp.int32)
    flagsN = jnp.zeros((S,), jnp.int32)
    w1 = jnp.ones((S, T, 1), jnp.float32)
    mask = jnp.ones((S, T), jnp.float32)
    lr = jnp.float32(opts.learn_rate)

    def make_batch(seed):
        r = np.random.RandomState(seed)
        f = r.randn(S, T, I).astype(np.float32)
        prev = np.concatenate([f[:, :1], f[:, :-1]], axis=1)
        labels = (f @ W1 + 0.5 * (prev @ W2)).argmax(-1)
        return jnp.asarray(f), jnp.asarray(labels[..., None].astype(
            np.int32))

    t0 = time.time()
    acc_first = acc_last = None
    for i in range(nsteps):
        feats, ids = make_batch(i)
        flags = flags0 if i == 0 else flagsN
        params, opt, states, aux = step(params, opt, states, (), feats,
                                        ids, w1, mask, flags, lr)
        if i % 250 == 0 or i == nsteps - 1:
            acc = float(aux.correct) / float(aux.frames)
            avg = float(aux.xent) / float(aux.frames)
            print(f"[{'bf16' if bf16 else 'f32 '}] step {i:4d}: "
                  f"xent/frame {avg:.4f} acc {acc:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            if acc_first is None:
                acc_first = acc
            acc_last = acc
    chance = 1.0 / K
    print(f"[{'bf16' if bf16 else 'f32 '}] chance={chance:.4f} "
          f"first={acc_first:.4f} last={acc_last:.4f}")
    assert acc_last > 20 * chance, "did not learn"
    print(f"[{'bf16' if bf16 else 'f32 '}] CONVERGENCE OK")
    return acc_last


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    modes = sys.argv[1:] or ["f32"]
    accs = {}
    for m in modes:
        accs[m] = run(bf16=(m == "bf16"))
    if len(accs) > 1:
        print("final accuracies:", accs)
        if "f32" in accs and "bf16" in accs:
            # bf16 matmul mode must reach f32-level accuracy (parity
            # gate for making it a default)
            assert accs["bf16"] > accs["f32"] - 0.02, \
                "bf16 convergence parity FAILED"
            print("BF16 PARITY OK")


if __name__ == "__main__":
    main()
