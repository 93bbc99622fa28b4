"""best_path_word_segments + lattice-to-ctm."""

import numpy as np
import pytest

from kaldi_lstm_tpu.io.lattice import (
    CompactLattice,
    CompactLatticeArc,
    Lattice,
    LatticeArc,
    LatticeWriter,
    best_path_word_segments,
    lattice_best_path,
)
from kaldi_lstm_tpu.tools.lattice_to_ctm import main as ctm_main


def _compact_two_words():
    """sil(2f) -> w5(3f) -> w7(2f) plus a worse alternative w9."""
    c = CompactLattice()
    for _ in range(4):
        c.add_state()
    c.arcs[0].append(CompactLatticeArc(0, 0.1, 0.0, (11, 12), 1))
    c.arcs[1].append(CompactLatticeArc(5, 0.5, 1.0, (21, 22, 23), 2))
    c.arcs[1].append(CompactLatticeArc(9, 5.0, 5.0, (31,), 2))
    c.arcs[2].append(CompactLatticeArc(7, 0.2, 0.3, (41, 42), 3))
    c.final[3] = (0.0, 0.0, ())
    return c


def test_segments_compact_exact():
    segs, cost = best_path_word_segments(_compact_two_words())
    assert segs == [(5, 2, 3), (7, 5, 2)]
    words, tids, cost2 = lattice_best_path(_compact_two_words())
    assert words == [5, 7] and cost == pytest.approx(cost2)
    assert tids == [11, 12, 21, 22, 23, 41, 42]


def test_segments_state_level_grouping():
    """State-level lattice: word label on the word's first arc; frames
    group until the next label."""
    lat = Lattice()
    for _ in range(5):
        lat.add_state()
    lat.arcs[0].append(LatticeArc(11, 5, 0.1, 0.1, 1))  # w5 starts, 1f
    lat.arcs[1].append(LatticeArc(12, 0, 0.0, 0.1, 2))  # w5 2nd frame
    lat.arcs[2].append(LatticeArc(21, 7, 0.0, 0.1, 3))  # w7 starts
    lat.arcs[3].append(LatticeArc(22, 0, 0.0, 0.1, 4))
    lat.final[4] = (0.0, 0.0)
    segs, _ = best_path_word_segments(lat)
    assert segs == [(5, 0, 2), (7, 2, 2)]


def test_lattice_to_ctm_cli(tmp_path):
    with LatticeWriter(f"ark:{tmp_path}/lat.ark") as w:
        w.write("utt1", _compact_two_words())
    (tmp_path / "words.txt").write_text(
        "<eps> 0\nfive 5\nseven 7\nnine 9\n")
    out = tmp_path / "out.ctm"
    assert ctm_main([f"ark:{tmp_path}/lat.ark", str(out),
                     "--word-symbol-table", str(tmp_path / "words.txt"),
                     "--frame-shift", "0.01"]) == 0
    lines = out.read_text().strip().splitlines()
    assert lines == ["utt1 1 0.02 0.03 five",
                     "utt1 1 0.05 0.02 seven"]
