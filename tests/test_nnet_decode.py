"""Fused score->decode path (VERDICT r4 item 1): nnet_decode must
produce IDENTICAL transcripts/lattices to the two-stage
nnet_forward -> loglik.ark -> decode_faster/latgen_faster flow, with no
intermediate ark — including under the pipeline double-buffer and the
top-P pruned fetch."""

import pytest

import jax


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Tiny word corpus + briefly-trained AM shared by the parity
    tests."""
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.ali_to_pdf import main as ali_to_pdf
    from kaldi_lstm_tpu.tools.ali_to_post import main as ali_to_post
    from kaldi_lstm_tpu.tools.compute_class_counts import main as counts
    from kaldi_lstm_tpu.tools.make_word_synth_data import main as mksynth
    from kaldi_lstm_tpu.tools.train_lstm_streams import main as train

    d = str(tmp_path_factory.mktemp("fused"))
    assert mksynth(["--dir", d, "--num-words", "6", "--num-phones", "5",
                    "--states-per-phone", "2", "--feat-dim", "8",
                    "--num-utts", "60", "--min-pron", "2",
                    "--max-pron", "3", "--max-words", "5",
                    "--emission-noise", "0.4"]) == 0
    num_pdfs = 10
    assert ali_to_pdf([f"{d}/final.mdl", f"ark:{d}/ali.ark",
                       f"ark:{d}/pdf_ali.ark"]) == 0
    assert ali_to_post([f"ark:{d}/pdf_ali.ark", f"ark:{d}/post.ark"]) == 0
    proto = f"""<NnetProto>
<LstmProjectedStreams> <InputDim> 8 <OutputDim> 12 <CellDim> 16 <ParamScale> 0.08 <NumStream> 8
<AffineTransform> <InputDim> 12 <OutputDim> {num_pdfs} <ParamStddev> 0.1
<Softmax> <InputDim> {num_pdfs} <OutputDim> {num_pdfs}
</NnetProto>"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(0))
    nnet.write(f"{d}/nnet.iter0", params, binary=True)
    for i in range(2):
        assert train([f"scp:{d}/feats.scp", f"ark:{d}/post.ark",
                      f"{d}/nnet.iter{i}", f"{d}/nnet.iter{i+1}",
                      "--learn-rate=5e-3", "--num-stream=8",
                      "--targets-delay=0"]) == 0
    assert counts([f"ark:{d}/post.ark", f"{d}/counts.vec",
                   "--num-classes", str(num_pdfs),
                   "--counts-offset", "1"]) == 0

    # the two-stage baseline: loglik ark + decode + latgen
    from kaldi_lstm_tpu.tools.decode_faster import main as decode
    from kaldi_lstm_tpu.tools.latgen_faster import main as latgen
    from kaldi_lstm_tpu.tools.nnet_forward import main as fwd
    assert fwd([f"{d}/nnet.iter2", f"scp:{d}/feats.scp",
                f"ark:{d}/loglik.ark", "--apply-log=true",
                f"--class-frame-counts={d}/counts.vec"]) == 0
    assert decode([f"{d}/final.mdl", f"{d}/lexicon.txt", f"{d}/lm.arpa",
                   f"ark:{d}/loglik.ark", f"ark,t:{d}/hyp_ref.txt",
                   "--word-symbol-table", f"{d}/words.txt",
                   "--acoustic-scale", "1.0", "--beam", "18"]) == 0
    assert latgen([f"{d}/final.mdl", f"{d}/lexicon.txt", f"{d}/lm.arpa",
                   f"ark:{d}/loglik.ark", f"ark:{d}/lat_ref.ark",
                   "--transcript-wspecifier", f"ark,t:{d}/lhyp_ref.txt",
                   "--word-symbol-table", f"{d}/words.txt",
                   "--acoustic-scale", "1.0", "--beam", "18",
                   "--lattice-beam", "6"]) == 0
    return d


def _fused(d, out, extra):
    from kaldi_lstm_tpu.tools.nnet_decode import main as nd
    assert nd([f"{d}/nnet.iter2", f"{d}/final.mdl", f"{d}/lexicon.txt",
               f"{d}/lm.arpa", f"scp:{d}/feats.scp", out,
               "--apply-log=true",
               f"--class-frame-counts={d}/counts.vec",
               "--word-symbol-table", f"{d}/words.txt",
               "--acoustic-scale", "1.0", "--beam", "18"] + extra) == 0


def _read(path):
    with open(path) as f:
        return sorted(line.split() for line in f if line.strip())


def test_fused_matches_two_stage(corpus):
    d = corpus
    _fused(d, f"ark,t:{d}/hyp_fused.txt", [])
    assert _read(f"{d}/hyp_fused.txt") == _read(f"{d}/hyp_ref.txt")


def test_fused_latgen_matches(corpus):
    d = corpus
    _fused(d, f"ark,t:{d}/lhyp_fused.txt",
           ["--lattice-wspecifier", f"ark:{d}/lat_fused.ark",
            "--lattice-beam", "6"])
    assert _read(f"{d}/lhyp_fused.txt") == _read(f"{d}/lhyp_ref.txt")
    with open(f"{d}/lat_fused.ark", "rb") as a, \
            open(f"{d}/lat_ref.ark", "rb") as b:
        assert a.read() == b.read()   # bit-identical lattices


def test_pipeline_off_parity(corpus):
    d = corpus
    _fused(d, f"ark,t:{d}/hyp_nopipe.txt", ["--pipeline", "false"])
    assert _read(f"{d}/hyp_nopipe.txt") == _read(f"{d}/hyp_ref.txt")


def test_top_p_parity(corpus):
    """Device-side top-P pruned fetch: P=6 of K=10 — the floored
    reconstruction must not change decode results on this task."""
    d = corpus
    _fused(d, f"ark,t:{d}/hyp_topp.txt", ["--top-p", "6"])
    assert _read(f"{d}/hyp_topp.txt") == _read(f"{d}/hyp_ref.txt")


def test_odd_batch_boundary(corpus):
    """60 utts with batch 7 + pipeline: exercises the partial tail group
    interleaving with an in-flight batch."""
    d = corpus
    _fused(d, f"ark,t:{d}/hyp_b7.txt", ["--batch-utts", "7"])
    assert _read(f"{d}/hyp_b7.txt") == _read(f"{d}/hyp_ref.txt")