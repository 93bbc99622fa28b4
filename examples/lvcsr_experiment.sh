#!/usr/bin/env bash
# LVCSR-realism recipe (VERDICT r4 #5): a corpus hard enough that WER
# lives in a discriminating range (target 5-30%) at real-vocabulary
# scale, decoded through the full search stack with beam/max-active
# tuning:
#
#   10k-word lexicon, COUNTED trigram ARPA (sparse Markov word process,
#   Witten-Bell backoff), 2666 phones x 3 states = 7998 senones,
#   ~10 h synthesized audio with 40-SPEAKER variation (spectral tilt +
#   gain + per-bin jitter) on hard acoustics (overlapping profiles +
#   4x noise) -> fbank -> CMVN -> LSTMP(800c/512r) xent (newbob)
#   -> beam/max-active WER/RTF sweep -> fused score->decode headline.
#
# Stage walls + scores land in $dir/REPORT.md. Same env/claim rules as
# flagship_experiment.sh. Every knob env-overridable for toy dry runs.
#
#   bash examples/lvcsr_experiment.sh [workdir]
set -euo pipefail

dir=${1:-/tmp/klt_lvcsr}
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
mkdir -p "$dir"
report=$dir/REPORT.md
CPU=(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu)

NWORDS=${KLT_NWORDS:-10000} NBRANCH=${KLT_NBRANCH:-16}
NLMSENTS=${KLT_NLMSENTS:-60000}
NPHONES=${KLT_NPHONES:-2666} NSTATES=${KLT_NSTATES:-3}
NPDFS=$((NPHONES * NSTATES))
NUTTS=${KLT_NUTTS:-10240} NTRAIN=${KLT_NTRAIN:-10000}
NSPK=${KLT_NSPK:-40}
NSTREAM=${KLT_NSTREAM:-256} CELL=${KLT_CELL:-800} RECUR=${KLT_RECUR:-512}
GROUP=${KLT_GROUP:-16}
BEAMS=${KLT_BEAMS:-9,11,13,15}
MAXACT=${KLT_MAXACT:-3000,7000}
# MEASURED at this scale: with a 10k-word counted trigram (sparse ->
# weak LM mass per arc) and sharp log-lik AMs, acwt 1.0 lets the
# acoustics drown the LM and finals: 37.4 %WER on a CV subset where
# acwt 0.1 scores 1.85% (monotone through 0.2: 11.5, 0.15: 5.6,
# 0.08-0.05: 1.85). Kaldi's classic LVCSR operating point applies.
ACWT=${KLT_ACWT:-0.1}
# LR default is MEASURED at this scale (9.16 h, 3.28M frames/epoch):
# 3e-4 diverges in epoch 2 (CV 2.56 -> 463, caught by --reject-blowup
# but the forced-halving cascade then lands 13% worse CV than a stable
# run); 1e-4 is the best stable rate (CV 0.676 vs 0.683 at 5e-5).
LR=${KLT_LR:-1e-4}
# 2 = deep 2xLSTMP via the FAQ Q2 freeze-stack flow (the 1-layer exp
# model becomes the trunk); the deep fine-tune runs at LR/2 — the
# fine-tune is the divergence-prone stage (CLAUDE.md: stable LR shrinks
# with corpus size and with depth).
LAYERS=${KLT_LAYERS:-1}

stamp() { date +%s.%N; }
log_stage() {
  local t1; t1=$(stamp)
  local dt; dt=$(python -c "print(f'{$t1-$2:.1f}')")
  echo "| $1 | ${dt}s | ${3:-} |" >> "$report"
  echo "=== [$1] done in ${dt}s ${3:-}"
}

if [ ! -f "$report" ]; then
  {
    echo "# LVCSR-realism experiment"
    echo
    echo "Corpus: $NUTTS utts, $NWORDS-word lexicon, counted trigram LM"
    echo "(branch $NBRANCH, $NLMSENTS train sents), $NPHONES phones x"
    echo "$NSTATES states = $NPDFS senones, $NSPK speakers, hard"
    echo "acoustics. Model 40 -> LSTMP(${CELL}c/${RECUR}r) -> $NPDFS."
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
      --lm-order 3 --lm-branch $NBRANCH --lm-train-sents $NLMSENTS \
      --self-loop-prob 0.7 --max-words ${KLT_MAXWORDS:-12} \
      --eos-prob 0.1 --sil-prob 0.1 --min-pron 3 --max-pron 6 --seed 0
  rm -f "$dir/lang/feats.ark" "$dir/lang/feats.scp"
  log_stage "corpus (10k lexicon + counted trigram + alignments)" "$t0"
  touch "$dir/lang/.done"
fi

if [ ! -f "$dir/wav/.done" ]; then
  t0=$(stamp)
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.synth_wavs \
      "$dir/lang/final.mdl" "ark:$dir/lang/ali.ark" "$dir/wav" \
      --log-amp-stddev "${KLT_AMPSTD:-0.35}" \
      --noise-rms "${KLT_NOISE:-4.0}" \
      --num-speakers $NSPK
  hrs=$("${CPU[@]}" python -m kaldi_lstm_tpu.tools.wav_to_duration \
      "scp:$dir/wav/wav.scp" ark,t:- | awk '{s+=$2} END {printf "%.2fh", s/3600}')
  log_stage "wav synthesis ($NSPK speakers, hard acoustics)" "$t0" "$hrs audio"
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
  log_stage "targets + priors" "$t0"
  touch "$dir/targets/.done"
fi

{
  echo "<NnetProto>"
  echo "<Transmit> <InputDim> 40 <OutputDim> 40"
  echo "<LstmProjectedStreams> <InputDim> 40 <OutputDim> $RECUR <CellDim> $CELL <ParamScale> 0.01 <NumStream> 4"
  echo "<AffineTransform> <InputDim> $RECUR <OutputDim> $NPDFS <ParamStddev> 0.04"
  echo "<Softmax> <InputDim> $NPDFS <OutputDim> $NPDFS"
  echo "</NnetProto>"
} > "$dir/nnet.proto"

if [ ! -f "$dir/exp/.done" ]; then
  t0=$(stamp)
  python -m kaldi_lstm_tpu.tools.run_recipe \
      --tr-feats "scp:$dir/feats/tr.scp" \
      --tr-targets "ark:$dir/targets/post.ark" \
      --cv-feats "scp:$dir/feats/cv.scp" \
      --cv-targets "ark:$dir/targets/post.ark" \
      --proto "$dir/nnet.proto" --dir "$dir/exp" \
      --feature-transform "$dir/feats/feature_transform.nnet.txt" \
      --scheduler newbob --learn-rate $LR \
      --max-iters ${KLT_MAX_ITERS:-14} --min-iters ${KLT_MIN_ITERS:-4} \
      --grad-clip ${KLT_GRAD_CLIP:-50} \
      --num-stream $NSTREAM --batch-size 20 --targets-delay 0 \
      --step-group $GROUP --bf16 true --dump-interval 2000000
  log_stage "xent training (newbob, TPU)" "$t0"
  touch "$dir/exp/.done"
fi

# Deep stack (KLT_LAYERS=2): fresh LSTMP-2 + fresh senone affine over
# the FROZEN 1-layer trunk (<LearnRateCoef> 0), then unfreeze and
# fine-tune at LR/2 — the flagship_experiment.sh FAQ Q2 flow at LVCSR
# scale (see REPORT.md / examples/LVCSR_REPORT.md for measured CV/WER).
if [ "$LAYERS" -ge 2 ] && [ ! -f "$dir/stack/.done" ]; then
  t0=$(stamp)
  mkdir -p "$dir/stack"
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.nnet_edit \
      "$dir/exp/final.nnet" "$dir/stack/nnet.init" \
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
      --scheduler newbob --learn-rate $LR \
      --max-iters ${KLT_STACK_ITERS:-10} --min-iters ${KLT_STACK_ITERS:-10} \
      --keep-lr-iters ${KLT_STACK_KEEP_LR:-8} \
      --grad-clip ${KLT_GRAD_CLIP:-50} \
      --num-stream $NSTREAM --batch-size 20 --targets-delay 0 \
      --step-group $GROUP --bf16 true --dump-interval 2000000
  log_stage "stack layer 2 on frozen trunk (FAQ Q2 flow)" "$t0"
  touch "$dir/stack/.done"
fi
if [ "$LAYERS" -ge 2 ] && [ ! -f "$dir/deep/.done" ]; then
  t0=$(stamp)
  mkdir -p "$dir/deep"
  "${CPU[@]}" python -m kaldi_lstm_tpu.tools.nnet_edit \
      "$dir/stack/final.nnet" "$dir/deep/nnet.init" \
      --set-learn-rate-coef 1=1
  ftlr=$("${CPU[@]}" python -c "print(f'{$LR/2:.2e}')")
  python -m kaldi_lstm_tpu.tools.run_recipe \
      --tr-feats "scp:$dir/feats/tr.scp" \
      --tr-targets "ark:$dir/targets/post.ark" \
      --cv-feats "scp:$dir/feats/cv.scp" \
      --cv-targets "ark:$dir/targets/post.ark" \
      --dir "$dir/deep" \
      --feature-transform "$dir/feats/feature_transform.nnet.txt" \
      --scheduler newbob --learn-rate "$ftlr" \
      --max-iters ${KLT_MAX_ITERS:-16} --min-iters ${KLT_MIN_ITERS:-4} \
      --keep-lr-iters ${KLT_FT_KEEP_LR:-5} \
      --grad-clip ${KLT_GRAD_CLIP:-50} \
      --num-stream $NSTREAM --batch-size 20 --targets-delay 0 \
      --step-group $GROUP --bf16 true --dump-interval 2000000
  log_stage "deep fine-tune (unfrozen, LR/2)" "$t0"
  touch "$dir/deep/.done"
fi

expdir=$dir/exp
[ "$LAYERS" -ge 2 ] && expdir=$dir/deep
final_nnet=$expdir/final.nnet
if [ ! -f "$final_nnet" ]; then
  final_nnet=""
  for f in "$expdir"/nnet/nnet.iter*; do
    [ -s "$f" ] || continue
    if [ -z "$final_nnet" ] || [ "$f" -nt "$final_nnet" ]; then
      final_nnet=$f
    fi
  done
fi

mkdir -p "$dir/score"
grep -E "^utt" "$dir/lang/text" | tail -n $((NUTTS - NTRAIN)) \
    > "$dir/score/text.cv"

# scoring pass ONCE for the sweep (the sweep needs the same scores at
# every search config; the ark is a tuning tool here — the production
# path is the fused stage below)
if [ ! -f "$dir/score/.scored" ]; then
  t0=$(stamp)
  python -m kaldi_lstm_tpu.tools.nnet_forward \
      --feature-transform "$dir/feats/feature_transform.nnet.txt" \
      --class-frame-counts "$dir/targets/counts.vec" --apply-log=true \
      "$final_nnet" "scp:$dir/feats/cv.scp" "ark:$dir/score/loglik.ark"
  log_stage "AM scoring cv (TPU, sweep input)" "$t0"
  touch "$dir/score/.scored"
fi

if [ ! -f "$dir/score/.sweep" ]; then
  t0=$(stamp)
  "${CPU[@]}" python tools_dev/beam_sweep.py \
      "$dir/lang/final.mdl" "$dir/lang/lexicon.txt" "$dir/lang/lm.arpa" \
      "ark:$dir/score/loglik.ark" "$dir/score/text.cv" \
      --word-symbol-table "$dir/lang/words.txt" --acoustic-scale $ACWT \
      --beams "$BEAMS" --max-active "$MAXACT" \
      | tee "$dir/score/sweep.md"
  {
    echo
    echo "### beam / max-active sweep (trigram graph)"
    echo
    cat "$dir/score/sweep.md"
    echo
  } >> "$report"
  log_stage "beam/max-active WER-RTF sweep (CPU)" "$t0"
  touch "$dir/score/.sweep"
fi

# fused score->decode at the operating point: the production eval path
if [ ! -f "$dir/score/.fused" ]; then
  t0=$(stamp)
  python -m kaldi_lstm_tpu.tools.nnet_decode \
      --feature-transform "$dir/feats/feature_transform.nnet.txt" \
      --class-frame-counts "$dir/targets/counts.vec" --apply-log=true \
      "$final_nnet" \
      "$dir/lang/final.mdl" "$dir/lang/lexicon.txt" "$dir/lang/lm.arpa" \
      "scp:$dir/feats/cv.scp" "ark,t:$dir/score/hyp.txt" \
      --word-symbol-table "$dir/lang/words.txt" --acoustic-scale $ACWT \
      --beam "${KLT_OP_BEAM:-13}" --max-active "${KLT_OP_MAXACT:-7000}" \
      --top-p "${KLT_EVAL_TOPP:-0}" --num-threads 2
  wer_out=$("${CPU[@]}" python -m kaldi_lstm_tpu.tools.compute_wer \
      "$dir/score/text.cv" "$dir/score/hyp.txt")
  echo "$wer_out" >&2
  wer=$(printf '%s\n' "$wer_out" | sed -n 1p)
  log_stage "fused score->decode (operating point)" "$t0" "$wer"
  touch "$dir/score/.fused"
fi

echo "=== LVCSR experiment complete; report:"
cat "$report"
