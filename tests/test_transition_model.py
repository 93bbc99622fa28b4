"""TransitionModel: tid->pdf derivation, text/binary round-trips,
<Tuples>-era self-loop pdfs, and the ali-to-pdf CLI end to end."""

import io

import numpy as np

from kaldi_lstm_tpu.io.kaldi_io import (
    KaldiInput,
    KaldiOutput,
    TableWriter,
    _read_key,
    _read_value_header,
    read_int_vector,
    write_int_vector,
)
from kaldi_lstm_tpu.io.transition_model import (
    HmmState,
    HmmTopology,
    TransitionModel,
    make_monophone_transition_model,
)


def test_monophone_tid_to_pdf():
    tm = make_monophone_transition_model(4, states_per_phone=3)
    assert tm.num_pdfs == 12
    # each (phone, state) has 2 transitions (self, forward)
    assert tm.num_transition_ids == 4 * 3 * 2
    # tuple 0 = (phone 1, state 0, pdf 0): tids 1,2
    assert tm.transition_id_to_pdf(1) == 0
    assert tm.transition_id_to_pdf(2) == 0
    # tuple index 4 = (phone 2, state 1, pdf 4): tids 9,10
    assert tm.transition_id_to_pdf(9) == 4
    assert tm.transition_id_to_pdf(10) == 4
    # last tid -> last pdf
    assert tm.transition_id_to_pdf(24) == 11


def roundtrip(tm, binary):
    buf = io.BytesIO()
    tm.write(KaldiOutput(buf, binary=binary))
    buf.seek(0)
    return TransitionModel.read(KaldiInput(io.BufferedReader(
        io.BufferedRandom(buf))))


def test_roundtrip_binary_and_text():
    tm = make_monophone_transition_model(5, states_per_phone=3,
                                         self_loop_prob=0.7)
    for binary in (True, False):
        tm2 = roundtrip(tm, binary)
        assert tm2.tuples == tm.tuples
        np.testing.assert_array_equal(tm2.id2pdf, tm.id2pdf)
        np.testing.assert_allclose(tm2.log_probs, tm.log_probs,
                                   rtol=1e-5)
        assert tm2.topo.phones == tm.topo.phones


def make_chain_like_model():
    """Distinct forward/self-loop pdfs (the <Tuples> era format)."""
    states = [HmmState(0, 1, [(0, 0.5), (1, 0.5)]),
              HmmState(-1, -1, [])]
    topo = HmmTopology([1, 2], [-1, 0, 0], [states])
    tuples = [(1, 0, 0, 1), (2, 0, 2, 3)]
    log_probs = np.zeros(5, np.float32)
    return TransitionModel(topo, tuples, log_probs)


def test_tuples_era_self_loop_pdf():
    tm = make_chain_like_model()
    # phone 1 state 0: tid 1 = self-loop (dst==0) -> pdf 1;
    # tid 2 = forward -> pdf 0
    assert tm.transition_id_to_pdf(1) == 1
    assert tm.transition_id_to_pdf(2) == 0
    assert tm.transition_id_to_pdf(3) == 3
    assert tm.transition_id_to_pdf(4) == 2
    for binary in (True, False):
        tm2 = roundtrip(tm, binary)
        assert tm2.tuples == tm.tuples
        np.testing.assert_array_equal(tm2.id2pdf, tm.id2pdf)


def test_ali_to_pdf_cli(tmp_path):
    from kaldi_lstm_tpu.tools.ali_to_pdf import main
    tm = make_monophone_transition_model(3, states_per_phone=2)
    mdl = tmp_path / "final.mdl"
    tm.dump(str(mdl), binary=True)

    rng = np.random.RandomState(0)
    alis = {f"utt{i}": rng.randint(1, tm.num_transition_ids + 1,
                                   size=rng.randint(5, 20))
            for i in range(4)}
    ali_ark = tmp_path / "ali.ark"
    with TableWriter(f"ark:{ali_ark}", write_int_vector) as w:
        for k, v in alis.items():
            w.write(k, v)

    pdf_ark = tmp_path / "pdf.ark"
    assert main([str(mdl), f"ark:{ali_ark}", f"ark:{pdf_ark}"]) == 0

    with open(pdf_ark, "rb") as f:
        stream = io.BufferedReader(f)
        got = {}
        while True:
            key = _read_key(stream)
            if key is None:
                break
            got[key] = read_int_vector(_read_value_header(stream))
    assert set(got) == set(alis)
    for k in alis:
        np.testing.assert_array_equal(
            got[k], tm.transition_ids_to_pdfs(alis[k]))
    # all pdfs in range
    for v in got.values():
        assert v.min() >= 0 and v.max() < tm.num_pdfs


def test_out_of_range_tid_raises(tmp_path):
    tm = make_monophone_transition_model(2, states_per_phone=2)
    try:
        tm.transition_ids_to_pdfs([0])
        assert False, "expected ValueError"
    except ValueError:
        pass
    try:
        tm.transition_ids_to_pdfs([tm.num_transition_ids + 1])
        assert False, "expected ValueError"
    except ValueError:
        pass
