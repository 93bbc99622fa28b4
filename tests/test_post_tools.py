"""Recipe posterior/alignment utilities: ali-to-phones (SplitToPhones
segmentation), weight-silence-post, post-to-weights — and the classic
pipe ali-to-post | weight-silence-post | post-to-weights producing
frame weights with silence zeroed."""

import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    TableWriter,
    _open_rspecifier,
    _read_key,
    _read_value_header,
    read_posterior,
    read_vector,
    write_int_vector,
)
from kaldi_lstm_tpu.io.transition_model import (
    TransitionModel,
    make_monophone_transition_model,
)

TM = make_monophone_transition_model(3, 2, self_loop_prob=0.5)
# tids per tuple (phone,state): (1,0)->1,2  (1,1)->3,4  (2,0)->5,6
# (2,1)->7,8  (3,0)->9,10  (3,1)->11,12 ; odd = self-loop, even = fwd


def _read_posts(path):
    _k, stream = _open_rspecifier(f"ark:{path}")
    import io as _io
    b = stream if isinstance(stream, _io.BufferedReader) \
        else _io.BufferedReader(stream)
    out = {}
    while True:
        key = _read_key(b)
        if key is None:
            break
        out[key] = read_posterior(_read_value_header(b))
    return out


def _read_vecs(path):
    _k, stream = _open_rspecifier(f"ark:{path}")
    import io as _io
    b = stream if isinstance(stream, _io.BufferedReader) \
        else _io.BufferedReader(stream)
    out = {}
    while True:
        key = _read_key(b)
        if key is None:
            break
        out[key] = read_vector(_read_value_header(b))
    return out


def test_derived_flags():
    # forward transition out of the last emitting state is final
    assert TM.id2self_loop[1] and not TM.id2self_loop[2]
    assert not TM.id2final[2]      # state 0 -> state 1
    assert TM.id2final[4]          # state 1 -> non-emitting final
    assert list(TM.id2phone[[1, 4, 5, 12]]) == [1, 1, 2, 3]


def test_split_to_phones():
    # phone 1: states 0,0,1 then phone 2: 0,1,1(final)
    ali = np.asarray([1, 1, 2, 4, 5, 6, 7, 8])
    segs = TM.split_to_phones(ali)
    assert [list(s) for s in segs] == [[1, 1, 2, 4], [5, 6, 7, 8]]
    # defective alignment (no final transition): split on phone change
    ali2 = np.asarray([1, 2, 9, 10])
    segs2 = TM.split_to_phones(ali2)
    assert [list(s) for s in segs2] == [[1, 2], [9, 10]]


def test_ali_to_phones_modes(tmp_path):
    from kaldi_lstm_tpu.tools.ali_to_phones import main as a2p
    d = str(tmp_path)
    TM.dump(f"{d}/final.mdl")
    ali = np.asarray([1, 1, 2, 4, 5, 6, 7, 8], np.int32)
    with TableWriter(f"ark:{d}/ali.ark", write_int_vector) as w:
        w.write("u1", ali)

    assert a2p([f"{d}/final.mdl", f"ark:{d}/ali.ark",
                f"ark:{d}/ph.ark"]) == 0
    from kaldi_lstm_tpu.io.kaldi_io import read_int_vector
    import io as _io
    _k, s = _open_rspecifier(f"ark:{d}/ph.ark")
    b = _io.BufferedReader(s)
    assert _read_key(b) == "u1"
    assert list(read_int_vector(_read_value_header(b))) == [1, 2]

    assert a2p([f"{d}/final.mdl", f"ark:{d}/ali.ark",
                f"ark:{d}/phf.ark", "--per-frame=true"]) == 0
    _k, s = _open_rspecifier(f"ark:{d}/phf.ark")
    b = _io.BufferedReader(s)
    _read_key(b)
    got = list(read_int_vector(_read_value_header(b)))
    assert got == list(TM.transition_ids_to_phones(ali))
    assert got == [1, 1, 1, 1, 2, 2, 2, 2]

    assert a2p([f"{d}/final.mdl", f"ark:{d}/ali.ark",
                f"ark,t:{d}/lens.ark", "--write-lengths=true"]) == 0
    text = open(f"{d}/lens.ark").read()
    assert text.strip() == "u1 1 4 ; 2 4"


def test_weight_silence_post_and_post_to_weights(tmp_path):
    from kaldi_lstm_tpu.io.kaldi_io import PosteriorWriter
    from kaldi_lstm_tpu.tools.post_to_weights import main as p2w
    from kaldi_lstm_tpu.tools.weight_silence_post import main as wsp
    d = str(tmp_path)
    TM.dump(f"{d}/final.mdl")
    # frames: [sil only], [mixed sil+speech], [speech only]
    post = [[(1, 1.0)], [(2, 0.4), (5, 0.6)], [(7, 1.0)]]
    with PosteriorWriter(f"ark:{d}/post.ark") as w:
        w.write("u1", post)

    # zero weight drops silence entries entirely
    assert wsp(["0.0", "1", f"{d}/final.mdl", f"ark:{d}/post.ark",
                f"ark:{d}/post0.ark"]) == 0
    got = _read_posts(f"{d}/post0.ark")["u1"]
    assert got[0] == []
    assert [(i, round(w, 5)) for i, w in got[1]] == [(5, 0.6)]
    assert [(i, round(w, 5)) for i, w in got[2]] == [(7, 1.0)]

    # scaling by 0.5
    assert wsp(["0.5", "1", f"{d}/final.mdl", f"ark:{d}/post.ark",
                f"ark:{d}/post5.ark"]) == 0
    got = _read_posts(f"{d}/post5.ark")["u1"]
    assert [(i, round(w, 5)) for i, w in got[0]] == [(1, 0.5)]
    assert round(got[1][0][1], 5) == 0.2 and round(got[1][1][1], 5) == 0.6

    # distribute renormalizes each frame back to its original mass
    assert wsp(["0.5", "1", f"{d}/final.mdl", f"ark:{d}/post.ark",
                f"ark:{d}/postd.ark", "--distribute=true"]) == 0
    got = _read_posts(f"{d}/postd.ark")["u1"]
    for orig, frame in zip(post, got):
        want = sum(w for _i, w in orig)
        assert abs(sum(w for _i, w in frame) - want) < 1e-6

    # post-to-weights sums the frame mass
    assert p2w([f"ark:{d}/post0.ark", f"ark:{d}/w.ark"]) == 0
    w = _read_vecs(f"{d}/w.ark")["u1"]
    np.testing.assert_allclose(w, [0.0, 0.6, 1.0], rtol=1e-6)


def test_silence_weighting_pipeline(tmp_path):
    """ali -> ali_to_post -> weight_silence_post 0.0 -> post_to_weights:
    weights are exactly the non-silence indicator of the frame phones."""
    from kaldi_lstm_tpu.tools.ali_to_post import main as a2post
    from kaldi_lstm_tpu.tools.post_to_weights import main as p2w
    from kaldi_lstm_tpu.tools.weight_silence_post import main as wsp
    d = str(tmp_path)
    TM.dump(f"{d}/final.mdl")
    rng = np.random.RandomState(0)
    alis = {f"u{i}": rng.randint(1, TM.num_transition_ids + 1,
                                 size=rng.randint(5, 12)).astype(np.int32)
            for i in range(4)}
    with TableWriter(f"ark:{d}/ali.ark", write_int_vector) as w:
        for k, a in alis.items():
            w.write(k, a)
    assert a2post([f"ark:{d}/ali.ark", f"ark:{d}/post.ark"]) == 0
    assert wsp(["0.0", "1:3", f"{d}/final.mdl", f"ark:{d}/post.ark",
                f"ark:{d}/postw.ark"]) == 0
    assert p2w([f"ark:{d}/postw.ark", f"ark:{d}/w.ark"]) == 0
    weights = _read_vecs(f"{d}/w.ark")
    for k, a in alis.items():
        phones = TM.transition_ids_to_phones(a)
        want = np.where(np.isin(phones, [1, 3]), 0.0, 1.0)
        np.testing.assert_allclose(weights[k], want)


def test_ali_to_phones_ctm_output(tmp_path):
    from kaldi_lstm_tpu.tools.ali_to_phones import main as a2p
    d = str(tmp_path)
    TM.dump(f"{d}/final.mdl")
    ali = np.asarray([1, 1, 2, 4, 5, 6, 7, 8], np.int32)
    with TableWriter(f"ark:{d}/ali.ark", write_int_vector) as w:
        w.write("u1", ali)
    assert a2p([f"{d}/final.mdl", f"ark:{d}/ali.ark", f"{d}/ph.ctm",
                "--ctm-output=true"]) == 0
    lines = open(f"{d}/ph.ctm").read().strip().splitlines()
    assert lines == ["u1 1 0.00 0.04 1", "u1 1 0.04 0.04 2"]
