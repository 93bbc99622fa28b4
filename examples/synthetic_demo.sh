#!/usr/bin/env bash
# End-to-end demo on synthetic data: generate a corpus, estimate CMVN,
# train the google-config multi-stream LSTMP with the full recipe,
# convert for decoding, and score with prior division — the complete
# reference workflow (train_lstm_streams.sh + README.md Q1), natively.
#
#   bash examples/synthetic_demo.sh [workdir]
#
# Runs on whatever JAX backend is active (TPU if available). On a CPU-only
# shell, prefix with: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu
set -euo pipefail

dir=${1:-/tmp/klt_demo}
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
mkdir -p "$dir"

echo "=== 1. synthetic corpus (train + cv)"
python -m kaldi_lstm_tpu.tools.make_synth_data --dir "$dir/tr" \
    --num-utts 40 --feat-dim 40 --num-classes 100 --seed 0
python -m kaldi_lstm_tpu.tools.make_synth_data --dir "$dir/cv" \
    --num-utts 10 --feat-dim 40 --num-classes 100 --seed 1

echo "=== 2. CMVN feature transform"
python -m kaldi_lstm_tpu.tools.compute_cmvn_transform \
    "scp:$dir/tr/feats.scp" "$dir/feature_transform.nnet.txt"

echo "=== 3. topology prototype"
cat > "$dir/nnet.proto" <<EOF
<NnetProto>
<Transmit> <InputDim> 40 <OutputDim> 40
<LstmProjectedStreams> <InputDim> 40 <OutputDim> 128 <CellDim> 200 <ParamScale> 0.01 <NumStream> 4
<AffineTransform> <InputDim> 128 <OutputDim> 100 <ParamStddev> 0.04
<Softmax> <InputDim> 100 <OutputDim> 100
</NnetProto>
EOF

echo "=== 4. training recipe (4 iterations)"
python -m kaldi_lstm_tpu.tools.run_recipe \
    --tr-feats "scp:$dir/tr/feats.scp" --tr-targets "ark:$dir/tr/post.ark" \
    --cv-feats "scp:$dir/cv/feats.scp" --cv-targets "ark:$dir/cv/post.ark" \
    --proto "$dir/nnet.proto" --dir "$dir/exp" \
    --feature-transform "$dir/feature_transform.nnet.txt" \
    --learn-rate 1.5e-3 --max-iters 8 --start-halving 6 \
    --num-stream 8 --batch-size 20 --targets-delay 0

echo "=== 5. decode conversion + prior counts"
python -m kaldi_lstm_tpu.tools.nnet_copy --to-standard --time-shift=0 \
    "$dir/exp/nnet/nnet.iter8" "$dir/nnet.final"
python -m kaldi_lstm_tpu.tools.compute_class_counts \
    "ark:$dir/tr/post.ark" "$dir/counts.vec" --num-classes 100

echo "=== 6. AM scoring"
python -m kaldi_lstm_tpu.tools.nnet_forward \
    --feature-transform "$dir/feature_transform.nnet.txt" \
    --class-frame-counts "$dir/counts.vec" --apply-log=true \
    "$dir/nnet.final" "scp:$dir/cv/feats.scp" "ark:$dir/loglik.ark"

echo "=== demo complete; outputs in $dir"
