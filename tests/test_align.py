"""Forced alignment (align-mapped): on oracle acoustics the aligned
transition-ids must map to the true per-frame pdfs; optional silence
and multiple pronunciations resolve to the best-scoring variant;
impossible transcripts raise instead of returning garbage."""

import numpy as np
import pytest

from kaldi_lstm_tpu.decode.align import (
    AlignmentError,
    align_mapped,
    build_alignment_graph,
)
from kaldi_lstm_tpu.io.transition_model import (
    make_monophone_transition_model,
)
from tests.test_word_decode import _emit, _oracle_setup


def test_align_oracle_exact():
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    lex, lm, tm, means, rng = _oracle_setup(seed=5)
    for _ in range(8):
        sent = sample_sentence(rng, lm, sorted(lex), 6) or ["w000"]
        loglik = _emit(tm, lex, means, rng, sent, noise=0.2)
        graph = build_alignment_graph(tm, lex, sent)
        tids, words, score = align_mapped(graph, loglik)
        assert len(tids) == loglik.shape[0]
        got_pdfs = tm.transition_ids_to_pdfs(tids)
        true_pdfs = loglik.argmax(axis=1)   # oracle: well-separated
        np.testing.assert_array_equal(got_pdfs, true_pdfs)
        assert [graph.words.id2sym[i] for i in words] == sent


def test_align_with_optional_silence():
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence
    lex, lm, tm, means, rng = _oracle_setup(seed=7)
    for _ in range(5):
        sent = sample_sentence(rng, lm, sorted(lex), 5) or ["w000"]
        loglik = _emit(tm, lex, means, rng, sent, noise=0.2,
                       sil_prob=0.6)
        graph = build_alignment_graph(tm, lex, sent, sil_phone=1,
                                      sil_prob=0.5)
        tids, words, _ = align_mapped(graph, loglik)
        got_pdfs = tm.transition_ids_to_pdfs(tids)
        np.testing.assert_array_equal(got_pdfs, loglik.argmax(axis=1))
        assert [graph.words.id2sym[i] for i in words] == sent


def test_align_picks_better_pronunciation():
    tm = make_monophone_transition_model(4, 2, self_loop_prob=0.5)
    # word "a" has two prons: phones [1,2] and [3,4]
    lex = {"a": [[1, 2], [3, 4]]}
    rng = np.random.RandomState(0)
    means = rng.randn(tm.num_pdfs, 8) * 3.0
    # truth follows the SECOND pronunciation: phones 3,4 (2 states each)
    true_pdfs = [4, 4, 5, 6, 7, 7]
    loglik = np.zeros((len(true_pdfs), tm.num_pdfs))
    d2 = ((means[true_pdfs][:, None] - means[None]) ** 2).sum(-1)
    loglik = -0.5 * d2
    graph = build_alignment_graph(tm, lex, ["a"])
    tids, words, _ = align_mapped(graph, loglik)
    np.testing.assert_array_equal(tm.transition_ids_to_pdfs(tids),
                                  true_pdfs)


def test_align_impossible_transcript_raises():
    lex, lm, tm, means, rng = _oracle_setup(seed=9)
    sent = [sorted(lex)[0]] * 6          # needs >= 6*len(pron)*3 frames
    loglik = _emit(tm, lex, means, rng, [sorted(lex)[0]], noise=0.2)
    min_frames = sum(len(lex[w][0]) * 3 for w in sent)
    assert loglik.shape[0] < min_frames
    graph = build_alignment_graph(tm, lex, sent)
    with pytest.raises(AlignmentError):
        align_mapped(graph, loglik)
    with pytest.raises(ValueError, match="lexicon"):
        build_alignment_graph(tm, lex, ["not-a-word"])


def test_align_mapped_cli_roundtrip(tmp_path):
    from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter
    from kaldi_lstm_tpu.io.lang import write_lexicon
    from kaldi_lstm_tpu.tools.align_mapped import main as align_main
    from kaldi_lstm_tpu.tools.ali_to_pdf import main as alipdf_main
    from kaldi_lstm_tpu.tools.make_word_synth_data import sample_sentence

    lex, lm, tm, means, rng = _oracle_setup(seed=13)
    tm.dump(str(tmp_path / "final.mdl"))
    write_lexicon(str(tmp_path / "lexicon.txt"), lex)
    texts, truths = {}, {}
    with MatrixWriter(f"ark:{tmp_path}/loglik.ark") as w:
        for u in range(4):
            sent = sample_sentence(rng, lm, sorted(lex), 5) or ["w000"]
            ll = _emit(tm, lex, means, rng, sent, noise=0.2)
            w.write(f"utt{u}", ll.astype(np.float32))
            texts[f"utt{u}"] = sent
            truths[f"utt{u}"] = ll.argmax(axis=1)
    with open(tmp_path / "text", "w") as f:
        for k, sent in texts.items():
            f.write(k + " " + " ".join(sent) + "\n")

    rc = align_main([str(tmp_path / "final.mdl"),
                     str(tmp_path / "lexicon.txt"),
                     f"ark:{tmp_path}/loglik.ark",
                     str(tmp_path / "text"),
                     f"ark:{tmp_path}/ali.ark"])
    assert rc == 0
    assert alipdf_main([str(tmp_path / "final.mdl"),
                        f"ark:{tmp_path}/ali.ark",
                        f"ark:{tmp_path}/pdf.ark"]) == 0
    from kaldi_lstm_tpu.io.kaldi_io import (
        _open_rspecifier, _read_key, _read_value_header, read_int_vector)
    import io as _io
    _, stream = _open_rspecifier(f"ark:{tmp_path}/pdf.ark")
    buf = stream if isinstance(stream, _io.BufferedReader) \
        else _io.BufferedReader(stream)
    seen = 0
    while True:
        key = _read_key(buf)
        if key is None:
            break
        pdfs = read_int_vector(_read_value_header(buf))
        np.testing.assert_array_equal(pdfs, truths[key])
        seen += 1
    assert seen == 4


def test_nnet_align_fused_matches_two_stage(tmp_path):
    """Fused score+align (tools/nnet_align.py) produces the identical
    ali.ark as nnet_forward -> align_mapped, without the intermediate
    loglik ark."""
    import jax
    from kaldi_lstm_tpu.io.kaldi_io import (
        SequentialMatrixReader,
        _open_rspecifier,
        _read_key,
        _read_value_header,
        read_int_vector,
    )
    import io as _io
    from kaldi_lstm_tpu.models import Nnet
    from kaldi_lstm_tpu.tools.align_mapped import main as align_main
    from kaldi_lstm_tpu.tools.compute_class_counts import main as counts_main
    from kaldi_lstm_tpu.tools.ali_to_pdf import main as a2p_main
    from kaldi_lstm_tpu.tools.ali_to_post import main as a2post_main
    from kaldi_lstm_tpu.tools.make_word_synth_data import main as mk_main
    from kaldi_lstm_tpu.tools.nnet_align import main as fused_main
    from kaldi_lstm_tpu.tools.nnet_forward import main as fwd_main

    d = tmp_path
    mk_main(["--dir", str(d), "--num-words", "6", "--num-phones", "5",
             "--states-per-phone", "2", "--num-utts", "10",
             "--feat-dim", "8", "--seed", "3"])
    tm_pdfs = 5 * 2
    a2p_main([f"{d}/final.mdl", f"ark:{d}/ali.ark", f"ark:{d}/pdf.ark"])
    a2post_main([f"ark:{d}/pdf.ark", f"ark:{d}/post.ark"])
    counts_main([f"ark:{d}/post.ark", f"{d}/counts.vec",
                 "--num-classes", str(tm_pdfs)])
    proto = f"""<NnetProto>
<LstmProjectedStreams> <InputDim> 8 <OutputDim> 6 <CellDim> 8 <ParamScale> 0.08 <NumStream> 2
<AffineTransform> <InputDim> 6 <OutputDim> {tm_pdfs} <ParamStddev> 0.2
<Softmax> <InputDim> {tm_pdfs} <OutputDim> {tm_pdfs}
</NnetProto>
"""
    nnet, params = Nnet.init_from_proto(proto, jax.random.PRNGKey(2))
    nnet.write(f"{d}/nnet", params)

    common = ["--class-frame-counts", f"{d}/counts.vec",
              "--batch-utts", "3", "--length-bucket", "16"]
    assert fwd_main([f"{d}/nnet", f"scp:{d}/feats.scp",
                     f"ark:{d}/ll.ark", "--apply-log", "true"]
                    + common) == 0
    assert align_main([f"{d}/final.mdl", f"{d}/lexicon.txt",
                       f"ark:{d}/ll.ark", f"{d}/text",
                       f"ark:{d}/ali2.ark", "--acoustic-scale", "1.0"]
                      ) == 0
    assert fused_main([f"{d}/nnet", f"{d}/final.mdl", f"{d}/lexicon.txt",
                       f"scp:{d}/feats.scp", f"{d}/text",
                       f"ark:{d}/ali_fused.ark",
                       "--acoustic-scale", "1.0"] + common) == 0

    def read_ali(path):
        kind, stream = _open_rspecifier(f"ark:{path}")
        buf = _io.BufferedReader(stream)
        out = {}
        while True:
            key = _read_key(buf)
            if key is None:
                break
            out[key] = read_int_vector(_read_value_header(buf)).tolist()
        return out

    two_stage = read_ali(f"{d}/ali2.ark")
    fused = read_ali(f"{d}/ali_fused.ark")
    assert two_stage.keys() == fused.keys() and len(fused) == 10
    for k in fused:
        assert fused[k] == two_stage[k]
