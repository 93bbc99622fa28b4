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

echo "=== 0. native front end: wav -> fbank -> deltas -> compressed ark"
mkdir -p "$dir/wav"
python - "$dir/wav" <<'EOF'
import sys, numpy as np
from kaldi_lstm_tpu.io.wav import write_wav
d = sys.argv[1]
rng = np.random.RandomState(0)
with open(f"{d}/wav.scp", "w") as f:
    for i in range(3):
        t = np.arange(16000) / 16000.0
        x = 8000 * np.sin(2 * np.pi * (300 + 200 * i) * t) \
            + 500 * rng.randn(16000)
        write_wav(f"{d}/u{i}.wav", 16000, x)
        f.write(f"utt{i} {d}/u{i}.wav\n")
EOF
python -m kaldi_lstm_tpu.tools.compute_fbank_feats "scp:$dir/wav/wav.scp" \
    "ark,scp:$dir/wav/fbank.ark,$dir/wav/fbank.scp" --num-mel-bins 40
python -m kaldi_lstm_tpu.tools.add_deltas "scp:$dir/wav/fbank.scp" \
    "ark:$dir/wav/fbank_dd.ark"
python -m kaldi_lstm_tpu.tools.copy_feats "ark:$dir/wav/fbank_dd.ark" \
    "ark:$dir/wav/fbank_dd_c.ark" --compress=true

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

echo "=== 7. word-level pipeline: lexicon + bigram LM -> %WER"
python -m kaldi_lstm_tpu.tools.make_word_synth_data --dir "$dir/words" \
    --num-words 8 --num-phones 6 --states-per-phone 2 --feat-dim 10 \
    --num-utts 80 --emission-noise 0.4
python -m kaldi_lstm_tpu.tools.ali_to_pdf "$dir/words/final.mdl" \
    "ark:$dir/words/ali.ark" "ark:$dir/words/pdf_ali.ark"
python -m kaldi_lstm_tpu.tools.ali_to_post "ark:$dir/words/pdf_ali.ark" \
    "ark:$dir/words/post.ark"
cat > "$dir/words/nnet.proto" <<EOF
<NnetProto>
<LstmProjectedStreams> <InputDim> 10 <OutputDim> 16 <CellDim> 24 <ParamScale> 0.08 <NumStream> 8
<AffineTransform> <InputDim> 16 <OutputDim> 12 <ParamStddev> 0.1
<Softmax> <InputDim> 12 <OutputDim> 12
</NnetProto>
EOF
python -m kaldi_lstm_tpu.tools.nnet_initialize "$dir/words/nnet.proto" \
    "$dir/words/nnet.iter0"
for i in 0 1 2 3; do
  python -m kaldi_lstm_tpu.tools.train_lstm_streams \
      "scp:$dir/words/feats.scp" "ark:$dir/words/post.ark" \
      "$dir/words/nnet.iter$i" "$dir/words/nnet.iter$((i+1))" \
      --learn-rate=5e-3 --num-stream=8 --targets-delay=0 --step-group=4
done
python -m kaldi_lstm_tpu.tools.compute_class_counts \
    "ark:$dir/words/post.ark" "$dir/words/counts.vec" --num-classes 12 \
    --counts-offset 1
python -m kaldi_lstm_tpu.tools.nnet_forward \
    --class-frame-counts "$dir/words/counts.vec" --apply-log=true \
    "$dir/words/nnet.iter4" "scp:$dir/words/feats.scp" \
    "ark:$dir/words/loglik.ark"
python -m kaldi_lstm_tpu.tools.decode_faster "$dir/words/final.mdl" \
    "$dir/words/lexicon.txt" "$dir/words/lm.arpa" \
    "ark:$dir/words/loglik.ark" "ark,t:$dir/words/hyp.txt" \
    --word-symbol-table "$dir/words/words.txt" --acoustic-scale 1.0 \
    --beam 18
python -m kaldi_lstm_tpu.tools.compute_wer "$dir/words/text" \
    "$dir/words/hyp.txt"

echo "=== 8. lattices: latgen -> text ark -> best path (same %WER)"
python -m kaldi_lstm_tpu.tools.latgen_faster "$dir/words/final.mdl" \
    "$dir/words/lexicon.txt" "$dir/words/lm.arpa" \
    "ark:$dir/words/loglik.ark" "ark:$dir/words/lat.ark" \
    --acoustic-scale 1.0 --beam 18 --lattice-beam 7
python -m kaldi_lstm_tpu.tools.lattice_copy "ark:$dir/words/lat.ark" \
    "ark,t:$dir/words/lat.txt.ark"
python -m kaldi_lstm_tpu.tools.lattice_best_path "ark:$dir/words/lat.ark" \
    "ark,t:$dir/words/hyp_lat.txt" \
    --word-symbol-table "$dir/words/words.txt"
python -m kaldi_lstm_tpu.tools.compute_wer "$dir/words/text" \
    "$dir/words/hyp_lat.txt"
# word-level timings (CTM) from the determinized lattices
python -m kaldi_lstm_tpu.tools.lattice_to_ctm "ark:$dir/words/lat.ark" \
    "$dir/words/hyp.ctm" --word-symbol-table "$dir/words/words.txt"
head -3 "$dir/words/hyp.ctm"

echo "=== 9. sequence training: realign -> sMBR fine-tune -> same %WER"
python -m kaldi_lstm_tpu.tools.align_mapped "$dir/words/final.mdl" \
    "$dir/words/lexicon.txt" "ark:$dir/words/loglik.ark" \
    "$dir/words/text" "ark:$dir/words/ali_re.ark" --acoustic-scale 1.0
python -m kaldi_lstm_tpu.tools.nnet_train_smbr "scp:$dir/words/feats.scp" \
    "ark:$dir/words/ali_re.ark" "$dir/words/final.mdl" \
    "$dir/words/nnet.iter4" "$dir/words/nnet.smbr" \
    --learn-rate 1e-3 --acoustic-scale 1.0 --length-bucket 32
python -m kaldi_lstm_tpu.tools.nnet_forward \
    --class-frame-counts "$dir/words/counts.vec" --apply-log=true \
    "$dir/words/nnet.smbr" "scp:$dir/words/feats.scp" \
    "ark:$dir/words/loglik_smbr.ark"
python -m kaldi_lstm_tpu.tools.decode_faster "$dir/words/final.mdl" \
    "$dir/words/lexicon.txt" "$dir/words/lm.arpa" \
    "ark:$dir/words/loglik_smbr.ark" "ark,t:$dir/words/hyp_smbr.txt" \
    --word-symbol-table "$dir/words/words.txt" --acoustic-scale 1.0 \
    --beam 18
python -m kaldi_lstm_tpu.tools.compute_wer "$dir/words/text" \
    "$dir/words/hyp_smbr.txt"

echo "=== demo complete; outputs in $dir"
