"""Full WORD-level pipeline end to end — the reference's complete recipe
shape including the word decode it defers to upstream Kaldi
(README.md:17-30), self-contained:

make_word_synth_data -> ali-to-pdf -> ali-to-post -> train ->
class counts -> nnet-forward (log-lik, prior division) ->
decode_faster (HCLG-lite graph from lexicon + bigram ARPA LM) ->
compute_wer. Asserts low %WER on separable synthetic acoustics."""

import re

import pytest

import jax


@pytest.mark.slow
def test_word_pipeline(tmp_path, capsys):
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.ali_to_pdf import main as ali_to_pdf
    from kaldi_lstm_tpu.tools.ali_to_post import main as ali_to_post
    from kaldi_lstm_tpu.tools.compute_class_counts import main as counts
    from kaldi_lstm_tpu.tools.compute_wer import main as wer
    from kaldi_lstm_tpu.tools.decode_faster import main as decode
    from kaldi_lstm_tpu.tools.make_word_synth_data import main as mksynth
    from kaldi_lstm_tpu.tools.nnet_forward import main as fwd
    from kaldi_lstm_tpu.tools.train_lstm_streams import main as train

    d = str(tmp_path)
    assert mksynth(["--dir", d, "--num-words", "6", "--num-phones", "5",
                    "--states-per-phone", "2", "--feat-dim", "8",
                    "--num-utts", "100", "--min-pron", "2",
                    "--max-pron", "3", "--max-words", "5",
                    "--emission-noise", "0.4"]) == 0
    num_pdfs = 5 * 2

    assert ali_to_pdf([f"{d}/final.mdl", f"ark:{d}/ali.ark",
                       f"ark:{d}/pdf_ali.ark"]) == 0
    assert ali_to_post([f"ark:{d}/pdf_ali.ark", f"ark:{d}/post.ark"]) == 0

    proto = f"""<NnetProto>
<LstmProjectedStreams> <InputDim> 8 <OutputDim> 16 <CellDim> 24 <ParamScale> 0.08 <NumStream> 8
<AffineTransform> <InputDim> 16 <OutputDim> {num_pdfs} <ParamStddev> 0.1
<Softmax> <InputDim> {num_pdfs} <OutputDim> {num_pdfs}
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    nnet.write(f"{d}/nnet.iter0", params, binary=True)

    for i in range(6):
        assert train([f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
                      f"{d}/nnet.iter{i}", f"{d}/nnet.iter{i+1}",
                      "--learn-rate=5e-3", "--num-stream=8",
                      "--targets-delay=0"]) == 0

    assert counts([f"ark:{d}/post.ark", f"{d}/counts.vec",
                   "--num-classes", str(num_pdfs),
                   "--counts-offset", "1"]) == 0
    assert fwd([f"{d}/nnet.iter6", f"scp:{d}/feats.scp",
                f"ark:{d}/loglik.ark", "--apply-log=true",
                f"--class-frame-counts={d}/counts.vec"]) == 0
    assert decode([f"{d}/final.mdl", f"{d}/lexicon.txt", f"{d}/lm.arpa",
                   f"ark:{d}/loglik.ark", f"ark,t:{d}/hyp.txt",
                   "--word-symbol-table", f"{d}/words.txt",
                   "--acoustic-scale", "1.0", "--beam", "18"]) == 0
    assert wer([f"{d}/text", f"{d}/hyp.txt"]) == 0

    out = capsys.readouterr().out
    m = re.search(r"%WER (\d+\.\d+)", out)
    assert m, f"no WER line in: {out!r}"
    w = float(m.group(1))
    assert w < 15.0, f"WER too high: {w} (output: {out!r})"
