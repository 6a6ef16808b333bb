#!/usr/bin/env python3
"""Assemble a buildable copy of the reference pbrt-v4 CPU renderer.

The checkout at /root/reference has empty src/ext submodules and two
missing data files (bluenoise.cpp, pmj02tables.cpp). This script copies
src/pbrt into /tmp/refbuild/src, applies surgical patches (NanoVDB medium
removal, GUI stub), generates stand-in data tables, and emits a Makefile.
Throwaway build aid for creating the perf/parity baseline; never committed.
"""
import os
import re
import shutil
import subprocess
import sys

REF = "/root/reference"
OUT = "/tmp/refbuild"
SRC = os.path.join(OUT, "src")


def copy_tree():
    if os.path.exists(os.path.join(SRC, "pbrt")):
        shutil.rmtree(os.path.join(SRC, "pbrt"))
    shutil.copytree(os.path.join(REF, "src/pbrt"), os.path.join(SRC, "pbrt"))
    # make writable
    subprocess.run(["chmod", "-R", "u+w", SRC], check=True)


def patch_file(path, edits):
    with open(path) as f:
        text = f.read()
    for old, new in edits:
        if old not in text:
            raise SystemExit(f"patch failed: {path}: pattern not found:\n{old[:120]}")
        text = text.replace(old, new, 1)
    with open(path, "w") as f:
        f.write(text)


def delete_span(path, start_marker, end_marker, include_end=True):
    """Delete from the line containing start_marker through the line
    containing end_marker (first occurrence after start)."""
    with open(path) as f:
        lines = f.readlines()
    s = next(i for i, l in enumerate(lines) if start_marker in l)
    e = next(i for i in range(s + 1, len(lines)) if end_marker in lines[i])
    if not include_end:
        e -= 1
    del lines[s:e + 1]
    with open(path, "w") as f:
        f.writelines(lines)


def patch_nanovdb():
    mh = os.path.join(SRC, "pbrt/media.h")
    patch_file(mh, [(
        "#include <nanovdb/NanoVDB.h>\n"
        "#include <nanovdb/util/GridHandle.h>\n"
        "#include <nanovdb/util/SampleFromVoxels.h>\n"
        "#ifdef PBRT_BUILD_GPU_RENDERER\n"
        "#include <nanovdb/util/CudaDeviceBuffer.h>\n"
        "#endif  // PBRT_BUILD_GPU_RENDERER\n",
        "// nanovdb removed in this build (submodule absent)\n",
    )])
    # remove NanoVDBBuffer through end of NanoVDBMedium class
    delete_span(mh, "class NanoVDBBuffer", "NanoVDBMedium Definition", include_end=False) \
        if False else None
    # find spans by unique markers instead
    with open(mh) as f:
        text = f.read()
    s = text.index("class NanoVDBBuffer")
    # NanoVDBMedium class body runs until the PhaseFunction inline dispatchers
    e = text.index("inline Float PhaseFunction::p(")
    text = (text[:s] + "// NanoVDB classes removed (submodule absent)\n\n"
            + text[e:])
    with open(mh, "w") as f:
        f.write(text)

    mc = os.path.join(SRC, "pbrt/media.cpp")
    with open(mc) as f:
        text = f.read()
    text = text.replace("#include <nanovdb/NanoVDB.h>\n", "")
    text = text.replace("#include <nanovdb/util/IO.h>\n", "")
    s = text.index("// NanoVDBMedium Method Definitions")
    e = text.index("Medium Medium::Create(")
    text = text[:s] + text[e:]
    text = text.replace(
        "    } else if (name == \"nanovdb\") {\n"
        "        m = NanoVDBMedium::Create(parameters, renderFromMedium, loc, alloc);\n",
        "    } else if (name == \"nanovdb\") {\n"
        "        ErrorExit(loc, \"nanovdb media disabled in this build.\");\n",
    )
    with open(mc, "w") as f:
        f.write(text)

    bm = os.path.join(SRC, "pbrt/base/medium.h")
    patch_file(bm, [
        ("class NanoVDBMedium;\n", ""),
        (", NanoVDBMedium", ""),
    ])


def patch_gui():
    gh = os.path.join(SRC, "pbrt/util/gui.h")
    patch_file(gh, [(
        "#include <glad/glad.h>\n#include <GLFW/glfw3.h>\n",
        "// glad/GLFW removed in this build (submodules absent)\n"
        "struct GLFWwindow;  // opaque\n",
    )])
    # replace gui.cpp with a stub
    with open(os.path.join(SRC, "pbrt/util/gui.cpp"), "w") as f:
        f.write(
            '#include <pbrt/util/gui.h>\n'
            '#include <pbrt/util/error.h>\n'
            'namespace pbrt {\n'
            'GUI::GUI(std::string, Vector2i, Bounds3f) {\n'
            '    ErrorExit("interactive GUI disabled in this build (GLFW absent)");\n'
            '}\n'
            'GUI::~GUI() {}\n'
            'DisplayState GUI::RefreshDisplay() { return EXIT; }\n'
            'void GUI::keyboardCallback(GLFWwindow *, int, int, int, int) {}\n'
            'void GUI::cursorPosCallback(GLFWwindow *, double, double) {}\n'
            'void GUI::mouseButtonCallback(GLFWwindow *, int, int, int) {}\n'
            'void GUI::Initialize() {}\n'
            'Point2i GUI::GetResolution() { return Point2i(0, 0); }\n'
            'bool GUI::processKeys() { return false; }\n'
            'bool GUI::processMouse() { return false; }\n'
            'bool GUI::process() { return false; }\n'
            '}  // namespace pbrt\n'
        )


def gen_tables():
    """Generate stand-in bluenoise.cpp (white noise — only affects dither
    quality) and pmj02tables.cpp (Owen-scrambled Sobol (0,2) points — valid
    (0,2) sequences, different realizations than upstream's pmj02bn)."""
    import numpy as np

    rng = np.random.RandomState(0xB1DE)
    bn = rng.randint(0, 1 << 16, size=(48, 128, 128), dtype=np.uint32)
    with open(os.path.join(SRC, "pbrt/util/bluenoise.cpp"), "w") as f:
        f.write('#include <pbrt/util/bluenoise.h>\nnamespace pbrt {\n')
        f.write('PBRT_CONST uint16_t BlueNoiseTextures[NumBlueNoiseTextures]'
                '[BlueNoiseResolution][BlueNoiseResolution] = {\n')
        flat = bn.ravel()
        for i in range(0, flat.size, 64):
            f.write(",".join(str(v) for v in flat[i:i + 64]) + ",\n")
        f.write('};\n}  // namespace pbrt\n')

    # Sobol dims 0,1 with Owen scrambling per set
    n = 65536

    def sobol01(n):
        idx = np.arange(n, dtype=np.uint64)
        # dim 0: van der Corput (bit reversal)
        x = idx.astype(np.uint32)
        r = np.zeros_like(x)
        for b in range(32):
            r = (r << np.uint32(1)) | ((x >> np.uint32(b)) & np.uint32(1))
        # dim 1: Sobol dim-1 closed form
        y = np.zeros(n, dtype=np.uint32)
        v = np.uint32(1 << 31)
        xi = idx.copy()
        col = np.uint32(0x80000000)
        cols = []
        c = 1 << 31
        # direction numbers for Sobol dim 2 (m = 1,3,5,15,17,51,85,255...):
        # v_k = v_{k-1} ^ (v_{k-1} >> 1) gives the Pascal-triangle matrix
        vk = 1 << 31
        for k in range(32):
            cols.append(vk)
            vk = vk ^ (vk >> 1)
        cols = np.array(cols, dtype=np.uint32)
        for b in range(32):
            bit = ((idx >> np.uint64(b)) & np.uint64(1)).astype(np.uint32)
            y ^= bit * cols[b]
        return r, y

    def owen(x, seed):
        # hash-based Owen scrambling (Laine-Karras style rounds)
        x = x.astype(np.uint32)
        # reverse bits
        v = x
        r = np.zeros_like(v)
        for b in range(32):
            r = (r << np.uint32(1)) | ((v >> np.uint32(b)) & np.uint32(1))
        v = r
        v = (v + np.uint32(seed & 0xFFFFFFFF)) * np.uint32(0x9E3779B9)
        v ^= v * np.uint32(0x6C50B47C)
        v ^= v * np.uint32(0xB82F1E52)
        v ^= v * np.uint32(0xC7AFE638)
        v ^= v * np.uint32(0x8D22F6E6)
        r = np.zeros_like(v)
        for b in range(32):
            r = (r << np.uint32(1)) | ((v >> np.uint32(b)) & np.uint32(1))
        return r

    X, Y = sobol01(n)
    with open(os.path.join(SRC, "pbrt/util/pmj02tables.cpp"), "w") as f:
        f.write('#include <pbrt/util/pmj02tables.h>\nnamespace pbrt {\n')
        f.write('PBRT_CONST uint32_t pmj02bnSamples[nPMJ02bnSets]'
                '[nPMJ02bnSamples][2] = {\n')
        for s in range(5):
            xs = owen(X, 0xA511E9B3 + s * 0x9E3779B9)
            ys = owen(Y, 0x63D83595 + s * 0x9E3779B9)
            f.write('{\n')
            for i in range(0, n, 8):
                row = ",".join(f"{{{xs[j]}u,{ys[j]}u}}" for j in range(i, i + 8))
                f.write(row + ",\n")
            f.write('},\n')
        f.write('};\n}  // namespace pbrt\n')


def write_makefile():
    pbrt_srcs = subprocess.run(
        ["find", SRC + "/pbrt", "-name", "*.cpp"],
        capture_output=True, text=True, check=True).stdout.split()
    skip = ("_test.cpp", "/cmd/", "/gpu/")
    lib_srcs = sorted(s for s in pbrt_srcs
                      if not any(k in s for k in skip))
    test_srcs = sorted(s for s in pbrt_srcs
                       if s.endswith("_test.cpp"))
    ext_srcs = [
        f"{REF}/src/ext/rply/rply.cpp",
        f"{REF}/src/ext/skymodel/ArHosekSkyModel.c",
        f"{REF}/src/ext/flip/flip.cpp",
        f"{REF}/src/ext/gtest/gtest-all.cc",
    ]
    inc = (f"-I{SRC} -I{OUT}/shim -I{OUT}/gen -I{REF}/src/ext "
           f"-I{REF}/src/ext/flip -I{REF}/src/ext/gtest/.. -I{REF}/src "
           "-I/usr/include/OpenEXR -I/usr/include/Imath")
    defs = ("-DPBRT_IS_LINUX -DPBRT_HAVE_MMAP "
            "-DPBRT_HAVE_POSIX_MEMALIGN -DPBRT_NOINLINE= "
            "-DPBRT_RESTRICT=__restrict__ -DNDEBUG "
            "-DPTEX_STATIC")
    flags = f"-O2 -std=c++17 -fno-exceptions-workaround {inc} {defs} -w -pthread"
    flags = flags.replace("-fno-exceptions-workaround ", "")
    libs = ("-lOpenEXR-3_1 -lOpenEXRCore-3_1 -lIex-3_1 -lIlmThread-3_1 "
            "-lImath-3_1 -lz -ldeflate -pthread -lstdc++fs")

    objs, rules = [], []
    for s in lib_srcs + ext_srcs:
        o = "obj/" + re.sub(r"[/.]", "_", s.replace(SRC + "/", "").replace(REF + "/", "")) + ".o"
        objs.append(o)
        cc = "g++ -x c++" if s.endswith(".c") else "g++"
        rules.append(f"{o}: {s} gen/pbrt_soa.h gen/wavefront_workitems_soa.h\n"
                     f"\t{cc} {flags} -c {s} -o {o}\n")
    mk = [
        f"CXXFLAGS = {flags}",
        f"LIBS = {libs}",
        "all: pbrt imgtool",
        f"pbrt: {' '.join(objs)} obj/cmd_pbrt.o",
        f"\tg++ -o pbrt obj/cmd_pbrt.o {' '.join(objs)} $(LIBS)",
        f"imgtool: {' '.join(objs)} obj/cmd_imgtool.o",
        f"\tg++ -o imgtool obj/cmd_imgtool.o {' '.join(objs)} $(LIBS)",
        f"obj/cmd_pbrt.o: {SRC}/pbrt/cmd/pbrt.cpp",
        f"\tg++ $(CXXFLAGS) -c {SRC}/pbrt/cmd/pbrt.cpp -o obj/cmd_pbrt.o",
        f"obj/cmd_imgtool.o: {SRC}/pbrt/cmd/imgtool.cpp",
        f"\tg++ $(CXXFLAGS) -c {SRC}/pbrt/cmd/imgtool.cpp -o obj/cmd_imgtool.o",
        "gen/pbrt_soa.h: soac",
        f"\t./soac {SRC}/pbrt/pbrt.soa > gen/pbrt_soa.h",
        "gen/wavefront_workitems_soa.h: soac",
        f"\t./soac {SRC}/pbrt/wavefront/workitems.soa > gen/wavefront_workitems_soa.h",
        f"soac: {SRC}/pbrt/cmd/soac.cpp",
        f"\tg++ -O1 -std=c++17 -I{SRC} -w -o soac {SRC}/pbrt/cmd/soac.cpp",
        "",
    ]
    mk += rules
    with open(os.path.join(OUT, "Makefile"), "w") as f:
        f.write("\n".join(mk))
    os.makedirs(os.path.join(OUT, "obj"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "gen"), exist_ok=True)


if __name__ == "__main__":
    copy_tree()
    # shim headers for the absent src/ext submodules live next to this script
    shim_src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shim")
    shim_dst = os.path.join(OUT, "shim")
    if os.path.exists(shim_dst):
        shutil.rmtree(shim_dst)
    shutil.copytree(shim_src, shim_dst)
    patch_nanovdb()
    patch_gui()
    gen_tables()
    write_makefile()
    print("assembled OK")
