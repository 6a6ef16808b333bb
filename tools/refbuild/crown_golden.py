"""Assemble + render the crown golden with the refbuild pbrt-v4 CPU binary.

The north-star gate (BASELINE.json) wants crown @64spp allclose vs pbrt-v4
CPU. The refbuild binary has lodepng stubbed (no network for submodules), so
the crown's 40 PNG textures are pre-converted to linear PFM (sRGB decode,
matching pbrt's ColorEncoding sRGB for 8-bit images, util/image.cpp) and the
scene file is rewritten to point at them, with resolution/spp reduced to keep
the 2-core CPU render tractable (1000x1400@512spp -> 250x350@64spp; same
camera/sampler/integrator otherwise, scenes/crown/crown.pbrt:3-19).

Usage:
    python tools/refbuild/crown_golden.py           # stage /tmp/crown_golden
    cd /tmp/crown_golden && /tmp/refbuild/pbrt --nthreads 2 crown_golden.pbrt
    cp /tmp/crown_golden/crown.exr data/golden/crown-volpath-250x350-64spp.exr
"""

import os
import re
import struct
import sys

import numpy as np

SRC = "/root/reference/scenes/crown"
DST = "/tmp/crown_golden"
RES = (250, 350)  # x, y — keeps the 1000:1400 aspect
SPP = 64


def srgb_to_linear(x: np.ndarray) -> np.ndarray:
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def write_pfm(path: str, rgb: np.ndarray) -> None:
    h, w, _ = rgb.shape
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        # PFM scanlines are bottom-up
        f.write(np.ascontiguousarray(rgb[::-1], np.float32).tobytes())


def main():
    from PIL import Image

    os.makedirs(DST, exist_ok=True)
    if not os.path.exists(os.path.join(DST, "geometry")):
        os.symlink(os.path.join(SRC, "geometry"), os.path.join(DST, "geometry"))

    tex_src = os.path.join(SRC, "textures")
    for root, _dirs, files in os.walk(tex_src):
        rel = os.path.relpath(root, tex_src)
        outdir = os.path.join(DST, "textures", rel)
        os.makedirs(outdir, exist_ok=True)
        for fn in files:
            if not fn.lower().endswith(".png"):
                continue
            out = os.path.join(outdir, fn[:-4] + ".pfm")
            if os.path.exists(out):
                continue
            raw = np.asarray(Image.open(os.path.join(root, fn)).convert("RGB"),
                             np.float32) / 255.0
            write_pfm(out, srgb_to_linear(raw))
            print("converted", os.path.join(rel, fn))

    scene = open(os.path.join(SRC, "crown.pbrt")).read()
    scene = scene.replace('"integer yresolution" [ 1400 ]',
                          f'"integer yresolution" [ {RES[1]} ]')
    scene = scene.replace('"integer xresolution" [ 1000 ]',
                          f'"integer xresolution" [ {RES[0]} ]')
    scene = scene.replace('"integer pixelsamples" [ 512 ]',
                          f'"integer pixelsamples" [ {SPP} ]')
    scene = re.sub(r'(textures/[\w/]+)\.png', r'\1.pfm', scene)
    open(os.path.join(DST, "crown_golden.pbrt"), "w").write(scene)
    print("staged", DST)


if __name__ == "__main__":
    main()
