"""Score hypothesis transcripts against references — upstream
compute-wer. Inputs are text tables: `key sym1 sym2 ...` per line.

    python -m kaldi_lstm_tpu.tools.compute_wer ref.txt hyp.txt
"""

from __future__ import annotations

import argparse
import sys

from kaldi_lstm_tpu.decode.wer import EditStats, edit_distance, wer_report


def read_text_table(path: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts:
                out[parts[0]] = parts[1:]
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Compute WER/PER between "
                                "reference and hypothesis text tables")
    p.add_argument("ref")
    p.add_argument("hyp")
    p.add_argument("--mode", choices=["strict", "present"],
                   default="strict",
                   help="strict: missing hypotheses are an error; "
                        "present: score only utterances present in hyp")
    args = p.parse_args(argv)

    ref = read_text_table(args.ref)
    hyp = read_text_table(args.hyp)
    total = EditStats()
    missing = 0
    for key, rwords in ref.items():
        if key not in hyp:
            missing += 1
            if args.mode == "strict":
                total.add(EditStats(errors=len(rwords),
                                    ref_len=len(rwords),
                                    dele=len(rwords), num_utts=1))
            continue
        total.add(edit_distance(rwords, hyp[key]))
    if missing:
        print(f"compute_wer: {missing} utterances missing from "
              f"hypothesis ({args.mode} mode)", file=sys.stderr)
    print(wer_report(total))
    print(f"%SER {100.0 * sum(1 for k in ref if hyp.get(k) != ref[k]) / max(len(ref), 1):.2f} "
          f"[ {sum(1 for k in ref if hyp.get(k) != ref[k])} / {len(ref)} ]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
