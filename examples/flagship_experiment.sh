#!/usr/bin/env bash
# Flagship-scale end-to-end experiment on real hardware (VERDICT r1 #7):
# a ~2-hour synthetic audio corpus at the reference's flagship dims
# (40-dim fbank -> LSTMP 800c/512r -> ~8k senones) through the COMPLETE
# reference workflow, natively:
#
#   corpus gen -> wav synthesis -> fbank -> CMVN -> xent train (newbob)
#     -> prior counts -> AM scoring -> word decode (%WER) -> latgen
#     -> lattice best path / CTM -> realign -> sMBR -> decode (%WER)
#
# Stage wall-times and scores are appended to $dir/REPORT.md.
#
#   python stages that need the TPU run with the default backend; pure
#   host stages run on CPU (no chip claim). Total wall ~1 h on one v5e.
#
#   bash examples/flagship_experiment.sh [workdir]
set -euo pipefail

dir=${1:-/tmp/klt_flagship}
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
mkdir -p "$dir"
report=$dir/REPORT.md
CPU=(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu)

# corpus/model scale (the reference's decode example is 8k-senone class
# of acoustic models; 2666 phones x 3 states = 7998 pdfs). Every knob
# is env-overridable for toy-scale dry runs (KLT_NPHONES=20 ... bash ...).
NPHONES=${KLT_NPHONES:-2666} NSTATES=${KLT_NSTATES:-3}
NPDFS=$((NPHONES * NSTATES))
NWORDS=${KLT_NWORDS:-500} NUTTS=${KLT_NUTTS:-1920}
NTRAIN=${KLT_NTRAIN:-1800}          # the rest are the test set
NSEQ=${KLT_NSEQ:-400}               # train subset for realign + sMBR
NSTREAM=${KLT_NSTREAM:-256} CELL=${KLT_CELL:-800} RECUR=${KLT_RECUR:-512}
GROUP=${KLT_GROUP:-16}
LAYERS=${KLT_LAYERS:-1}             # 2 = the reference decode example's
                                    # stacked 2xLSTMP (README.md:38-44)

stamp() { date +%s.%N; }
log_stage() {  # log_stage <name> <t0> [extra]
  local t1; t1=$(stamp)
  local dt; dt=$(python -c "print(f'{$t1-$2:.1f}')")
  echo "| $1 | ${dt}s | ${3:-} |" >> "$report"
  echo "=== [$1] done in ${dt}s ${3:-}"
}

if [ ! -f "$report" ]; then
  {
    echo "# Flagship end-to-end experiment"
    echo
    echo "Corpus: $NUTTS utts, $NWORDS-word lexicon, $NPHONES phones x"
    echo "$NSTATES states = $NPDFS senones; model 40 -> ${LAYERS}xLSTMP(${CELL}c/${RECUR}r)"
    echo "-> $NPDFS. Host: $(uname -r), $(nproc) cpus."
    echo
    echo "| stage | wall | notes |"
    echo "|---|---|---|"
  } > "$report"
fi

if [ ! -f "$dir/lang/.done" ]; then
  t0=$(stamp)
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.make_word_synth_data \
      --dir "$dir/lang" --num-words $NWORDS --num-phones $NPHONES \
      --states-per-phone $NSTATES --num-utts $NUTTS --feat-dim 4 \
      --self-loop-prob 0.7 --max-words 16 --eos-prob 0.08 \
      --min-pron 3 --max-pron 6 --seed 0
  rm -f "$dir/lang/feats.ark" "$dir/lang/feats.scp"  # wav path replaces these
  log_stage "corpus (lexicon+LM+alignments)" "$t0"
  touch "$dir/lang/.done"
fi

if [ ! -f "$dir/wav/.done" ]; then
  t0=$(stamp)
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.synth_wavs \
      "$dir/lang/final.mdl" "ark:$dir/lang/ali.ark" "$dir/wav" \
      --log-amp-stddev "${KLT_AMPSTD:-1.0}" --noise-rms "${KLT_NOISE:-1.0}"
  hrs=$("${CPU[@]}" python -m kaldi_lstm_tpu.tools.wav_to_duration \
      "scp:$dir/wav/wav.scp" ark,t:- | awk '{s+=$2} END {printf "%.2fh", s/3600}')
  log_stage "wav synthesis" "$t0" "$hrs audio"
  touch "$dir/wav/.done"
fi

if [ ! -f "$dir/feats/.done" ]; then
  t0=$(stamp)
  mkdir -p "$dir/feats"
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.compute_fbank_feats \
      "scp:$dir/wav/wav.scp" \
      "ark,scp:$dir/feats/fbank.ark,$dir/feats/fbank.scp" --num-mel-bins 40
  head -n $NTRAIN "$dir/feats/fbank.scp" > "$dir/feats/tr.scp"
  tail -n +$((NTRAIN + 1)) "$dir/feats/fbank.scp" > "$dir/feats/cv.scp"
  head -n $NSEQ "$dir/feats/fbank.scp" > "$dir/feats/seq.scp"
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.compute_cmvn_transform \
      "scp:$dir/feats/tr.scp" "$dir/feats/feature_transform.nnet.txt"
  log_stage "fbank + CMVN" "$t0" "$(wc -l < "$dir/feats/fbank.scp") utts"
  touch "$dir/feats/.done"
fi

if [ ! -f "$dir/targets/.done" ]; then
  t0=$(stamp)
  mkdir -p "$dir/targets"
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.ali_to_pdf \
      "$dir/lang/final.mdl" "ark:$dir/lang/ali.ark" \
      "ark:$dir/targets/pdf_ali.ark"
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.ali_to_post \
      "ark:$dir/targets/pdf_ali.ark" "ark:$dir/targets/post.ark"
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.compute_class_counts \
      "ark:$dir/targets/post.ark" "$dir/targets/counts.vec" \
      --num-classes $NPDFS
  log_stage "targets (ali->pdf->post) + priors" "$t0"
  touch "$dir/targets/.done"
fi

{
  echo "<NnetProto>"
  echo "<Transmit> <InputDim> 40 <OutputDim> 40"
  echo "<LstmProjectedStreams> <InputDim> 40 <OutputDim> $RECUR <CellDim> $CELL <ParamScale> 0.01 <NumStream> 4"
  if [ "$LAYERS" -ge 2 ]; then
    for _ in $(seq 2 "$LAYERS"); do
      echo "<LstmProjectedStreams> <InputDim> $RECUR <OutputDim> $RECUR <CellDim> $CELL <ParamScale> 0.01 <NumStream> 4"
    done
  fi
  echo "<AffineTransform> <InputDim> $RECUR <OutputDim> $NPDFS <ParamStddev> 0.04"
  echo "<Softmax> <InputDim> $NPDFS <OutputDim> $NPDFS"
  echo "</NnetProto>"
} > "$dir/nnet.proto"

# Deep stacks train via the reference's own layer-stacking flow (FAQ Q2
# / nnet1 discriminative pretraining): a cold 2xLSTMP at ParamScale 0.01
# attenuates the signal twice over and diverges at any LR that moves
# (measured: lr 3e-4 crawls at ~0.4 nats/iter, 6e-4 explodes even under
# --grad-clip 50). Train the 1-layer net first, then insert a fresh
# second LSTMP before the senone affine (klt-nnet-edit) and fine-tune
# the full stack. KLT_STACK_PRETRAIN=0 disables.
if [ "$LAYERS" -ge 2 ] && [ "${KLT_STACK_PRETRAIN:-1}" = 1 ] \
    && [ ! -f "$dir/pre/.done" ]; then
  t0=$(stamp)
  mkdir -p "$dir/pre" "$dir/exp"
  {
    echo "<NnetProto>"
    echo "<Transmit> <InputDim> 40 <OutputDim> 40"
    echo "<LstmProjectedStreams> <InputDim> 40 <OutputDim> $RECUR <CellDim> $CELL <ParamScale> 0.01 <NumStream> 4"
    echo "<AffineTransform> <InputDim> $RECUR <OutputDim> $NPDFS <ParamStddev> 0.04"
    echo "<Softmax> <InputDim> $NPDFS <OutputDim> $NPDFS"
    echo "</NnetProto>"
  } > "$dir/pre/nnet.proto"
  python -m kaldi_lstm_tpu.tools.run_recipe \
      --tr-feats "scp:$dir/feats/tr.scp" \
      --tr-targets "ark:$dir/targets/post.ark" \
      --cv-feats "scp:$dir/feats/cv.scp" \
      --cv-targets "ark:$dir/targets/post.ark" \
      --proto "$dir/pre/nnet.proto" --dir "$dir/pre" \
      --feature-transform "$dir/feats/feature_transform.nnet.txt" \
      --scheduler newbob --learn-rate ${KLT_LR:-3e-4} \
      --max-iters ${KLT_PRE_ITERS:-4} --min-iters ${KLT_PRE_ITERS:-4} \
      --grad-clip ${KLT_GRAD_CLIP:-0} \
      --num-stream $NSTREAM --batch-size 20 --targets-delay 0 \
      --step-group $GROUP --bf16 true --dump-interval 2000000
  log_stage "1-layer pretrain" "$t0"
  touch "$dir/pre/.done"
fi

# Stack: swap in [fresh LSTMP-2 + fresh senone affine] above the
# pretrained trunk and train THEM against the FROZEN trunk
# (<LearnRateCoef> 0) — keeping the trained affine destabilizes the
# stack (its weights encode layer-1 feature geometry; measured: the
# fine-tune oscillates at ~60 nats xent and never recovers), while a
# frozen trunk under a fresh top is exactly the 1-layer problem on
# better features. Then unfreeze for the main fine-tune below.
if [ "$LAYERS" -ge 2 ] && [ "${KLT_STACK_PRETRAIN:-1}" = 1 ] \
    && [ ! -f "$dir/stack/.done" ]; then
  t0=$(stamp)
  mkdir -p "$dir/stack" "$dir/exp"
  # host-only tool: run on the CPU backend (a plain python would claim
  # the TPU just to draw init params and can wedge behind the recipe's
  # just-released claim)
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.nnet_edit \
      "$dir/pre/final.nnet" "$dir/stack/nnet.init" \
      --remove-at 2 --insert-at 2 \
      --proto-line "<LstmProjectedStreams> <InputDim> $RECUR <OutputDim> $RECUR <CellDim> $CELL <ParamScale> 0.01 <NumStream> 4
<AffineTransform> <InputDim> $RECUR <OutputDim> $NPDFS <ParamStddev> 0.04" \
      --set-learn-rate-coef 1=0
  python -m kaldi_lstm_tpu.tools.run_recipe \
      --tr-feats "scp:$dir/feats/tr.scp" \
      --tr-targets "ark:$dir/targets/post.ark" \
      --cv-feats "scp:$dir/feats/cv.scp" \
      --cv-targets "ark:$dir/targets/post.ark" \
      --dir "$dir/stack" \
      --feature-transform "$dir/feats/feature_transform.nnet.txt" \
      --scheduler newbob --learn-rate ${KLT_LR:-3e-4} \
      --max-iters ${KLT_STACK_ITERS:-6} --min-iters ${KLT_STACK_ITERS:-6} \
      --grad-clip ${KLT_GRAD_CLIP:-0} \
      --num-stream $NSTREAM --batch-size 20 --targets-delay 0 \
      --step-group $GROUP --bf16 true --dump-interval 2000000
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.nnet_edit \
      "$dir/stack/final.nnet" "$dir/exp/nnet.init" \
      --set-learn-rate-coef 1=1
  log_stage "stack layer 2 on frozen trunk (FAQ Q2 flow)" "$t0"
  touch "$dir/stack/.done"
fi

if [ ! -f "$dir/exp/.done" ]; then
  t0=$(stamp)
  python -m kaldi_lstm_tpu.tools.run_recipe \
      --tr-feats "scp:$dir/feats/tr.scp" \
      --tr-targets "ark:$dir/targets/post.ark" \
      --cv-feats "scp:$dir/feats/cv.scp" \
      --cv-targets "ark:$dir/targets/post.ark" \
      --proto "$dir/nnet.proto" --dir "$dir/exp" \
      --feature-transform "$dir/feats/feature_transform.nnet.txt" \
      --scheduler newbob --learn-rate ${KLT_LR:-3e-4} \
      --max-iters ${KLT_MAX_ITERS:-14} --min-iters ${KLT_MIN_ITERS:-4} \
      --keep-lr-iters ${KLT_KEEP_LR_ITERS:-0} \
      --grad-clip ${KLT_GRAD_CLIP:-0} \
      --num-stream $NSTREAM --batch-size 20 --targets-delay 0 \
      --step-group $GROUP --bf16 true --dump-interval 2000000
  log_stage "xent training (newbob, TPU)" "$t0"
  touch "$dir/exp/.done"
fi

final_nnet=$dir/exp/final.nnet   # newbob's accepted final
if [ ! -f "$final_nnet" ]; then
  # no `ls -t | head -1` here: under pipefail, head exiting first races
  # SIGPIPE into a spurious abort (CLAUDE.md). Capture and pick newest.
  final_nnet=""
  for f in "$dir"/exp/nnet/nnet.iter*; do
    # -s, not -f: killed runs leave ZERO-BYTE model files (CLAUDE.md)
    # and the newest file is exactly the truncated one
    [ -s "$f" ] || continue
    if [ -z "$final_nnet" ] || [ "$f" -nt "$final_nnet" ]; then
      final_nnet=$f
    fi
  done
fi

# Fused score -> decode (VERDICT r4 #1): klt-nnet-decode streams AM
# posteriors straight into the word decoder — no multi-GB loglik ark
# (the 16624-senone scoring stage wrote a 3.7 GB ark and was the
# single largest wall item of the deep pipeline). One TPU process
# scores batches (double-buffered against the host decode) and the
# lattice-generating decoder consumes them in-process; best-path
# transcripts == Viterbi decode (pinned in earlier rounds + the
# fused==two-stage parity tests in tests/test_nnet_decode.py).
# KLT_EVAL_TOPP > 0 additionally prunes the posterior fetch on device.
mkdir -p "$dir/score"
grep -E "^utt" "$dir/lang/text" | tail -n $((NUTTS - NTRAIN)) \
    > "$dir/score/text.cv"

if [ ! -f "$dir/score/.fused" ]; then
  t0=$(stamp)
  python -m kaldi_lstm_tpu.tools.nnet_decode \
      --feature-transform "$dir/feats/feature_transform.nnet.txt" \
      --class-frame-counts "$dir/targets/counts.vec" --apply-log=true \
      "$final_nnet" \
      "$dir/lang/final.mdl" "$dir/lang/lexicon.txt" "$dir/lang/lm.arpa" \
      "scp:$dir/feats/cv.scp" "ark,t:$dir/score/hyp_lat.txt" \
      --lattice-wspecifier "ark:$dir/score/lat.ark" \
      --word-symbol-table "$dir/lang/words.txt" --acoustic-scale 1.0 \
      --beam 13 --lattice-beam 6 --max-active 7000 \
      --top-p "${KLT_EVAL_TOPP:-0}" --num-threads 2
  wer_out=$("${CPU[@]}" python -m kaldi_lstm_tpu.tools.compute_wer \
      "$dir/score/text.cv" "$dir/score/hyp_lat.txt")
  echo "$wer_out" >&2
  wer=$(printf '%s\n' "$wer_out" | sed -n 1p)
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.lattice_to_ctm \
      "ark:$dir/score/lat.ark" "$dir/score/hyp.ctm" \
      --word-symbol-table "$dir/lang/words.txt"
  log_stage "fused score->latgen + best path + CTM (xent)" "$t0" "$wer"
  touch "$dir/score/.fused"
fi

if [ ! -f "$dir/seq/.done" ]; then
  t0=$(stamp)
  mkdir -p "$dir/seq"
  head -n $NSEQ "$dir/lang/text" > "$dir/seq/text.seq"
  # fused score+align: no multi-GB loglik ark between the stages
  python -m kaldi_lstm_tpu.tools.nnet_align \
      --feature-transform "$dir/feats/feature_transform.nnet.txt" \
      --class-frame-counts "$dir/targets/counts.vec" --apply-log=true \
      "$final_nnet" "$dir/lang/final.mdl" "$dir/lang/lexicon.txt" \
      "scp:$dir/feats/seq.scp" "$dir/seq/text.seq" \
      "ark:$dir/seq/ali_re.ark" --acoustic-scale 1.0
  log_stage "realign $NSEQ train utts (fused score+align)" "$t0"
  touch "$dir/seq/.done"
fi

if [ ! -f "$dir/seq/.smbr" ]; then
  t0=$(stamp)
  python -m kaldi_lstm_tpu.tools.nnet_train_smbr \
      "scp:$dir/feats/seq.scp" "ark:$dir/seq/ali_re.ark" \
      "$dir/lang/final.mdl" "$final_nnet" "$dir/seq/nnet.smbr" \
      --feature-transform "$dir/feats/feature_transform.nnet.txt" \
      --learn-rate 1e-5 --acoustic-scale 1.0 --length-bucket 64
  log_stage "sMBR sequence training (TPU)" "$t0"
  touch "$dir/seq/.smbr"
fi

if [ ! -f "$dir/seq/.decoded" ]; then
  t0=$(stamp)
  python -m kaldi_lstm_tpu.tools.nnet_decode \
      --feature-transform "$dir/feats/feature_transform.nnet.txt" \
      --class-frame-counts "$dir/targets/counts.vec" --apply-log=true \
      "$dir/seq/nnet.smbr" \
      "$dir/lang/final.mdl" "$dir/lang/lexicon.txt" "$dir/lang/lm.arpa" \
      "scp:$dir/feats/cv.scp" "ark,t:$dir/seq/hyp_smbr.txt" \
      --word-symbol-table "$dir/lang/words.txt" --acoustic-scale 1.0 \
      --beam 13 --max-active 7000 \
      --top-p "${KLT_EVAL_TOPP:-0}" --num-threads 2
  wer_out=$("${CPU[@]}" python -m kaldi_lstm_tpu.tools.compute_wer \
      "$dir/score/text.cv" "$dir/seq/hyp_smbr.txt")
  echo "$wer_out" >&2
  wer=$(printf '%s\n' "$wer_out" | sed -n 1p)
  log_stage "fused score->decode (sMBR model)" "$t0" "$wer"
  touch "$dir/seq/.decoded"
fi

echo "=== experiment complete; report:"
cat "$report"
