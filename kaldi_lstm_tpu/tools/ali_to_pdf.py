"""Convert transition-id alignments to pdf-id alignments using a
transition model — the `ali-to-pdf` stage of the reference's target
pipeline (train_lstm_streams.sh:36: `ali-to-pdf $gmmdir/final.mdl
"ark:gunzip -c ali.gz |" ark:- | ali-to-post ark:- ark:-`).

    python -m kaldi_lstm_tpu.tools.ali_to_pdf final.mdl \
        ark:ali.ark ark:pdf_ali.ark
"""

from __future__ import annotations

import argparse
import io
import sys

from kaldi_lstm_tpu.io.kaldi_io import (
    TableWriter,
    _open_rspecifier,
    _read_key,
    _read_value_header,
    read_int_vector,
    write_int_vector,
)
from kaldi_lstm_tpu.io.transition_model import TransitionModel
from kaldi_lstm_tpu.utils import LOG


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Converts alignments (containing transition-ids) to "
                    "pdf-id sequences")
    p.add_argument("model")
    p.add_argument("ali_rspecifier")
    p.add_argument("pdf_wspecifier")
    args = p.parse_args(argv)

    tm = TransitionModel.load(args.model)
    kind, stream = _open_rspecifier(args.ali_rspecifier)
    if kind != "ark":
        print("ali_to_pdf: only ark: input supported", file=sys.stderr)
        return 1
    buffered = stream if isinstance(stream, io.BufferedReader) \
        else io.BufferedReader(stream)

    n = 0
    with TableWriter(args.pdf_wspecifier, write_int_vector) as w:
        while True:
            key = _read_key(buffered)
            if key is None:
                break
            inp = _read_value_header(buffered)
            ali = read_int_vector(inp)
            w.write(key, tm.transition_ids_to_pdfs(ali))
            n += 1
    LOG(f"Converted {n} alignments to pdf sequences "
        f"(model: {tm.num_pdfs} pdfs, "
        f"{tm.num_transition_ids} transition-ids)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
