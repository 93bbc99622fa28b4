"""Copy / convert Nnet models — the `nnet-copy` equivalent plus the
google→standard decode conversion the reference does by hand-editing text
dumps (/root/reference/README.md:17-30: Transmit→TimeShift,
LstmProjectedStreams→LstmProjected, drop <NumStream>).

    python -m kaldi_lstm_tpu.tools.nnet_copy [--binary=false]
        [--to-standard] [--time-shift=5] nnet.in nnet.out
"""

from __future__ import annotations

import argparse
import sys

from kaldi_lstm_tpu.models import Nnet
from kaldi_lstm_tpu.models.components import TimeShift
from kaldi_lstm_tpu.utils import LOG


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Copy Neural Network model "
                                "(possibly changing binary/text format or "
                                "converting google->standard form)")
    p.add_argument("model_in")
    p.add_argument("model_out")
    p.add_argument("--binary", default="true")
    p.add_argument("--to-standard", action="store_true",
                   help="Convert Transmit->TimeShift and "
                        "LstmProjectedStreams->LstmProjected for decoding")
    p.add_argument("--to-streams", action="store_true",
                   help="Inverse conversion: TimeShift->Transmit and "
                        "LstmProjected->LstmProjectedStreams (resume "
                        "multi-stream training from a standard net)")
    p.add_argument("--time-shift", type=int, default=5,
                   help="<Shift> for the TimeShift produced by "
                        "--to-standard (match --targets-delay)")
    p.add_argument("--remove-first-components", type=int, default=0,
                   help="Remove N first components (upstream nnet-copy; "
                        "e.g. strip a bundled feature transform)")
    p.add_argument("--remove-last-components", type=int, default=0,
                   help="Remove N last components (e.g. strip "
                        "AffineTransform+Softmax for bottleneck features)")
    args = p.parse_args(argv)

    nnet, params = Nnet.read(args.model_in)
    nfirst, nlast = args.remove_first_components, args.remove_last_components
    if nfirst < 0 or nlast < 0 or nfirst + nlast >= len(nnet.components):
        print(f"nnet-copy: cannot remove {nfirst}+{nlast} of "
              f"{len(nnet.components)} components", file=sys.stderr)
        return 1
    if nfirst or nlast:
        end = len(nnet.components) - nlast
        nnet = Nnet(list(nnet.components[nfirst:end]))
        params = tuple(params[nfirst:end])
        LOG(f"kept components {nfirst}..{end - 1} "
            f"({nnet.input_dim} -> {nnet.output_dim})")
    if args.to_standard and args.to_streams:
        print("nnet-copy: --to-standard and --to-streams are exclusive",
              file=sys.stderr)
        return 1
    if args.to_standard:
        nnet = nnet.to_standard()
        for c in nnet.components:
            if isinstance(c, TimeShift):
                c.shift = args.time_shift
    elif args.to_streams:
        nnet = nnet.to_streams()
    nnet.write(args.model_out, params,
               binary=str(args.binary).lower() in ("true", "1", "yes"))
    LOG(f"Written model to {args.model_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
