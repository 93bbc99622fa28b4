"""Beam / max-active operating-curve sweep over a scored CV set:
builds the decoding graph ONCE, then decodes the loglik ark at every
(beam, max_active) cell, reporting %WER, wall, and RTF (decode wall /
audio seconds at 100 fps). The search-tuning stage of the LVCSR recipe
(examples/lvcsr_experiment.sh); CPU only, no chip claim:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python \
      tools_dev/beam_sweep.py final.mdl lexicon.txt lm.arpa \
      ark:loglik.ark text.cv --beams 9,11,13,15 --max-active 3000,7000
"""

import argparse
import sys
import time

from kaldi_lstm_tpu.decode.faster import compile_graph, decode_faster
from kaldi_lstm_tpu.decode.graph import build_graph_from_arpa
from kaldi_lstm_tpu.decode.wer import edit_distance
from kaldi_lstm_tpu.io.kaldi_io import SequentialMatrixReader
from kaldi_lstm_tpu.io.lang import SymbolTable, read_lexicon
from kaldi_lstm_tpu.io.transition_model import TransitionModel


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("model")
    p.add_argument("lexicon")
    p.add_argument("arpa")
    p.add_argument("loglik_rspecifier")
    p.add_argument("ref_text")
    p.add_argument("--word-symbol-table", default="")
    p.add_argument("--acoustic-scale", type=float, default=1.0)
    p.add_argument("--beams", default="9,11,13,15")
    p.add_argument("--max-active", default="3000,7000")
    args = p.parse_args(argv)

    tm = TransitionModel.load(args.model)
    words = (SymbolTable.load(args.word_symbol_table)
             if args.word_symbol_table else None)
    t0 = time.perf_counter()
    graph = build_graph_from_arpa(tm, read_lexicon(args.lexicon),
                                  args.arpa, words=words,
                                  log_fn=lambda m: print(m,
                                                         file=sys.stderr))
    compile_graph(graph)
    print(f"graph: {graph.num_states} states, {graph.num_arcs()} arcs, "
          f"built+compiled in {time.perf_counter() - t0:.1f}s",
          flush=True)

    ref = {ln.split()[0]: ln.split()[1:]
           for ln in open(args.ref_text) if ln.strip()}
    mats = list(SequentialMatrixReader(args.loglik_rspecifier))
    audio_s = sum(len(m) for _, m in mats) / 100.0
    id2sym = graph.words.id2sym

    print(f"| beam | max-active | %WER | wall | RTF |")
    print(f"|---|---|---|---|---|")
    for beam in (float(b) for b in args.beams.split(",")):
        for ma in (int(m) for m in args.max_active.split(",")):
            t0 = time.perf_counter()
            errs = tot = 0
            for key, mat in mats:
                res = decode_faster(graph, mat, args.acoustic_scale,
                                    beam, ma)
                hyp = [id2sym[i] for i in res.words]
                st = edit_distance(ref[key], hyp)
                errs += st.errors
                tot += st.ref_len
            wall = time.perf_counter() - t0
            print(f"| {beam:g} | {ma} | "
                  f"{100.0 * errs / max(tot, 1):.2f} | {wall:.1f}s | "
                  f"{wall / audio_s:.4f} |", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
