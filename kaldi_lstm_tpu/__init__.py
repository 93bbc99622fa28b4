"""kaldi_lstm_tpu — a TPU-native LSTM acoustic-model framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
dophist/kaldi-lstm reference (projected-LSTM acoustic models with
multi-stream truncated-BPTT training for hybrid HMM/NN speech
recognition):

* ``ops``      — LSTMP cell numerics: pure-JAX `lax.scan` path and a fused
                 Pallas TPU kernel with custom VJP.
* ``models``   — the component/layer system (LstmProjected, AffineTransform,
                 Softmax, TimeShift, ...) and the sequential Nnet container,
                 with Kaldi-token-compatible text/binary serialization.
* ``train``    — masked cross-entropy loss, multi-stream truncated-BPTT
                 scheduler, jit'd training step with SGD+momentum.
* ``parallel`` — `jax.sharding.Mesh` device layout: data-parallel streams,
                 model-parallel senone output layer.
* ``io``       — Kaldi ark/scp table I/O (features, posteriors, alignments).
* ``tools``    — CLI entry points (train, forward scorer, init, copy).

Batch layout is stream-major ``[S, T, D]`` (the reference interleaves rows
as ``t*S + s``; see /root/reference/google/nnetbin/bd-nnet-train-lstm-streams.cc:187-206)
— the content is equivalent, the layout is chosen for TPU tiling and
sharding of the stream axis over the `data` mesh axis.
"""

__version__ = "0.1.0"
