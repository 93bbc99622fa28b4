"""Sticky-serving CLI: ragged-arrival hypotheses must equal the offline
pipeline; endpointing path runs through the CLI flags."""

import numpy as np
import pytest

from tests.test_online_serve_batch import _offline_hyps, corpus  # noqa: F401


def _sticky_hyps(d, extra=()):
    from kaldi_lstm_tpu.tools.online_serve_sticky import main as serve
    args = [f"{d}/final.nnet", f"{d}/final.mdl", f"{d}/lexicon.txt",
            f"{d}/lm.arpa", f"scp:{d}/feats.scp",
            f"ark,t:{d}/hyp_sticky.txt",
            "--word-symbol-table", f"{d}/words.txt",
            "--acoustic-scale", "0.7", "--beam", "15"] + list(extra)
    assert serve(args) == 0
    return dict(line.split(None, 1) if " " in line else (line, "")
                for line in open(f"{d}/hyp_sticky.txt").read().splitlines())


def test_sticky_cli_matches_offline(corpus):  # noqa: F811
    """Ragged Poisson chunks, staggered arrivals, fewer slots than
    sessions — identical hypotheses to the offline pipeline."""
    off = _offline_hyps(corpus)
    srv = _sticky_hyps(corpus, ["--num-slots", "4",
                                "--chunk-frames", "7",
                                "--arrival-hazard", "0.5",
                                "--mean-chunk", "5",
                                "--trace-seed", "3"])
    assert srv == off and len(srv) == 14


def test_sticky_cli_delay_matches_offline(corpus):  # noqa: F811
    off = _offline_hyps(corpus, delay=2)
    srv = _sticky_hyps(corpus, ["--num-slots", "3",
                                "--chunk-frames", "5",
                                "--targets-delay", "2",
                                "--arrival-hazard", "0.7",
                                "--mean-chunk", "4"])
    assert srv == off


def test_sticky_cli_zero_length_utterance(corpus, tmp_path):  # noqa: F811
    """A zero-length feature matrix must finalize as an empty result,
    not wedge the serving loop (review finding)."""
    import numpy as np

    from kaldi_lstm_tpu.io.kaldi_io import MatrixWriter
    d = corpus
    with MatrixWriter(f"ark,scp:{tmp_path}/z.ark,{tmp_path}/z.scp") as w:
        w.write("empty00", np.zeros((0, 8), np.float32))
        w.write("one00", np.zeros((3, 8), np.float32))
    from kaldi_lstm_tpu.tools.online_serve_sticky import main as serve
    assert serve([f"{d}/final.nnet", f"{d}/final.mdl",
                  f"{d}/lexicon.txt", f"{d}/lm.arpa",
                  f"scp:{tmp_path}/z.scp", f"ark,t:{tmp_path}/h.txt",
                  "--num-slots", "2", "--chunk-frames", "5"]) == 0
    keys = [ln.split()[0] for ln in open(f"{tmp_path}/h.txt")
            if ln.strip()]
    assert "empty00" in keys and "one00" in keys


def test_sticky_cli_endpointing_runs(corpus):  # noqa: F811
    """Endpoint flags wire through; with an absurd silence set (all
    pdfs) every session endpoints early."""
    srv = _sticky_hyps(corpus, ["--num-slots", "4",
                                "--endpoint-silence-pdfs",
                                ",".join(str(i) for i in range(10)),
                                "--endpoint-trailing-silence", "5",
                                "--endpoint-min-speech", "0"])
    assert len(srv) == 14  # all sessions produced (early) results