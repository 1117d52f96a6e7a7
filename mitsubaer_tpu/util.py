"""`mtsutil` analogue: image utility subcommands.

Reference: src/mtsutil/mtsutil.cpp:73 front end with the utility plugins in
src/utils/: tonemap.cpp, addimages.cpp, joinrgb.cpp. (kdbench has no
analogue: the TPU build has no kd-tree; `bench.py` is the perf harness.)

    python -m mitsubaer_tpu.util tonemap in.exr -o out.png [--exposure 2]
    python -m mitsubaer_tpu.util addimages a.exr b.exr -o sum.exr -w 0.5,0.5
    python -m mitsubaer_tpu.util joinrgb r.exr g.exr b.exr -o rgb.exr
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _load(path):
    from .utils import io

    return np.asarray(io.read_image(path), np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser(description="mitsubaer_tpu image utilities")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tonemap", help="EXR -> tonemapped PNG (tonemap.cpp)")
    t.add_argument("input")
    t.add_argument("-o", "--output", required=True)
    t.add_argument("--exposure", type=float, default=1.0)
    t.add_argument("--gamma", type=float, default=-1.0,
                   help="-1 = sRGB curve, else pow(1/gamma)")

    a = sub.add_parser("addimages", help="weighted sum of images (addimages.cpp)")
    a.add_argument("inputs", nargs="+")
    a.add_argument("-o", "--output", required=True)
    a.add_argument("-w", "--weights", default=None,
                   help="comma-separated weights (default: all 1)")

    j = sub.add_parser("joinrgb", help="merge per-channel renders (joinrgb.cpp)")
    j.add_argument("r")
    j.add_argument("g")
    j.add_argument("b")
    j.add_argument("-o", "--output", required=True)

    args = ap.parse_args(argv)
    from .utils import io

    if args.cmd == "tonemap":
        img = _load(args.input) * args.exposure
        if args.output.lower().endswith(".png"):
            io.write_png(args.output, img, gamma=args.gamma < 0)
        else:
            io.write_exr(args.output, img)
    elif args.cmd == "addimages":
        ws = ([float(x) for x in args.weights.split(",")]
              if args.weights else [1.0] * len(args.inputs))
        if len(ws) != len(args.inputs):
            sys.exit("weights count != images count")
        acc = None
        for path, w in zip(args.inputs, ws):
            img = _load(path) * w
            acc = img if acc is None else acc + img
        io.write_exr(args.output, acc)
    elif args.cmd == "joinrgb":
        r = _load(args.r)[..., 0]
        g = _load(args.g)[..., 0]
        b = _load(args.b)[..., 0]
        io.write_exr(args.output, np.stack([r, g, b], axis=-1))
    print(f"wrote {args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
