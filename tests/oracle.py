"""Golden-image oracle: an instrumented build of the reference decoder.

Implements the SURVEY.md §4.2 plan: copy the reference sources to a scratch
build dir (NOT into this repo), stub out the X11 display layer, and inject a
small dump hook into ``process_image_data`` that writes

* the **dequantized coefficient plane** (post-``dequantize()``,
  pre-``inverseDCT()`` — jpeg.cpp:786/787 boundary), and
* the **final RGB plane** (post-``YCbCrToRGB()``)

as raw int32 files.  These are the bit-exactness conformance surfaces.  Also
times ``process_image_data`` to provide the single-core C++ baseline number
(BASELINE.md first build action).

Only the injected hook below is our code; the reference sources are used
as-is from /root/reference.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

REFERENCE_DIR = "/root/reference"
CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         ".cache", "oracle")

_DISPLAY_STUB = """
#pragma once
#include <stdio.h>
#include <stdlib.h>
#include "types.hpp"
static bool displayImage(MCU *mcus, int w, int h, int mw, int mh, int mwr) {
  (void)mcus; (void)w; (void)h; (void)mw; (void)mh; (void)mwr;
  return true;
}
"""

# Injected member function: dumps header + raw MCU array (MCU struct is
# 3 contiguous int[64] fields, so fwrite of the array is the plane).
_DUMP_HOOK = r"""
  void dumpPlanes(const char *tag)
  {
    const char *prefix = getenv("DUMP_PREFIX");
    if (!prefix) return;
    std::string path = std::string(prefix) + "." + tag + ".bin";
    FILE *f = fopen(path.c_str(), "wb");
    if (!f) { exit(2); }
    int hdr[8] = {this->image_width, this->image_height,
                  this->mcuWidth, this->mcuHeight,
                  this->mcuWidthReal, this->mcuHeightReal,
                  this->horizontalSamplingFactor, this->verticalSamplingFactor};
    fwrite(hdr, sizeof(int), 8, f);
    fwrite(this->mcus, sizeof(MCU),
           (size_t)this->mcuWidthReal * this->mcuHeightReal, f);
    fclose(f);
  }
"""

_TIMER_TOP = r"""
    auto _t0 = std::chrono::steady_clock::now();
"""
_TIMER_REPORT = r"""
    {
      auto _t1 = std::chrono::steady_clock::now();
      double _ms = std::chrono::duration<double, std::milli>(_t1 - _t0).count();
      fprintf(stderr, "DECODE_MS %f\n", _ms);
      const char *prefix = getenv("DUMP_PREFIX");
      if (prefix) {
        std::string path = std::string(prefix) + ".time.txt";
        FILE *tf = fopen(path.c_str(), "w");
        if (tf) { fprintf(tf, "%f\n", _ms); fclose(tf); }
      }
    }
"""


def available() -> bool:
    return shutil.which("g++") is not None and os.path.isdir(REFERENCE_DIR)


def build() -> str:
    """Build the instrumented oracle binary (cached). Returns binary path."""
    binary = os.path.join(CACHE_DIR, "oracle")
    src = os.path.join(CACHE_DIR, "jpeg.cpp")
    ref_src = os.path.join(REFERENCE_DIR, "jpeg.cpp")
    if os.path.exists(binary) and \
            os.path.getmtime(binary) >= os.path.getmtime(ref_src):
        return binary
    os.makedirs(CACHE_DIR, exist_ok=True)
    shutil.copytree(os.path.join(REFERENCE_DIR, "include"),
                    os.path.join(CACHE_DIR, "include"), dirs_exist_ok=True)
    with open(os.path.join(CACHE_DIR, "include", "display.hpp"), "w") as f:
        f.write(_DISPLAY_STUB)

    code = open(ref_src).read()
    # Inject the dump hook before process_image_data and calls around the
    # pipeline stages (jpeg.cpp:785-788).
    code = code.replace("  void process_image_data()",
                        _DUMP_HOOK + "\n  void process_image_data()")
    code = code.replace("    this->mcus = decodeHuffman();",
                        _TIMER_TOP + "    this->mcus = decodeHuffman();")
    code = code.replace("    dequantize();",
                        '    dequantize();\n    dumpPlanes("coeff");')
    code = code.replace("    inverseDCT();",
                        '    inverseDCT();\n    dumpPlanes("idct");')
    code = code.replace(
        "    YCbCrToRGB();",
        '    YCbCrToRGB();\n' + _TIMER_REPORT + '    dumpPlanes("rgb");')
    assert "dumpPlanes(\"coeff\")" in code and "dumpPlanes(\"rgb\")" in code
    with open(src, "w") as f:
        f.write(code)

    subprocess.run(
        ["g++", "-O2", "-o", binary, src],
        cwd=CACHE_DIR, check=True, capture_output=True,
    )
    return binary


class OracleDump:
    """Parsed oracle output for one image."""

    def __init__(self, prefix: str):
        self.coeff = self._load(prefix + ".coeff.bin")
        self.rgb_raw = self._load(prefix + ".rgb.bin")
        try:
            self.idct = self._load(prefix + ".idct.bin")
        except OSError:
            self.idct = None
        try:
            self.decode_ms = float(open(prefix + ".time.txt").read().strip())
        except OSError:
            self.decode_ms = None

    @staticmethod
    def _load(path):
        raw = np.fromfile(path, dtype=np.int32)
        hdr, body = raw[:8], raw[8:]
        (w, h, mw, mh, mwr, mhr, hsf, vsf) = (int(x) for x in hdr)
        mcus = body.reshape(mhr, mwr, 3, 64)  # MCU = y[64], cb[64], cr[64]
        return dict(width=w, height=h, mcu_width=mw, mcu_height=mh,
                    mcu_width_real=mwr, mcu_height_real=mhr,
                    hsf=hsf, vsf=vsf, mcus=mcus)

    # ---- Dense per-component planes from the reference's sparse grid ----
    def comp_plane(self, ci: int) -> np.ndarray:
        """Dequantized coefficient plane for component ci as
        (rows_c, cols_c, 64), matching layout.py's dense SoA layout."""
        d = self.coeff
        hsf, vsf = d["hsf"], d["vsf"]
        mcus = d["mcus"]
        if ci == 0:
            return mcus[:, :, 0, :]
        # Chroma blocks live at MCU origins (stride vsf/hsf) in the sparse
        # grid (jpeg.cpp:432 with h=v=0).
        return mcus[::vsf, ::hsf, ci, :]

    def rgb_image(self) -> np.ndarray:
        """(H, W, 3) uint8 from the post-conversion dump (r/g/b live in the
        y/cb/cr unions, types.hpp:32-67)."""
        d = self.rgb_raw
        mcus = d["mcus"]  # (mhr, mwr, 3, 64)
        mhr, mwr = mcus.shape[:2]
        img = (mcus.reshape(mhr, mwr, 3, 8, 8)
                    .transpose(0, 3, 1, 4, 2)
                    .reshape(mhr * 8, mwr * 8, 3))
        return img[: d["height"], : d["width"]].astype(np.uint8)


def time_decode(image_path: str, repeats: int = 3) -> float:
    """Best-of-N wall time (ms) of the reference's process_image_data, with
    plane dumps DISABLED (the dump write would otherwise sit inside the
    timed window and inflate the reference's time)."""
    binary = build()
    env = dict(os.environ)
    env.pop("DUMP_PREFIX", None)
    best = None
    for _ in range(repeats):
        proc = subprocess.run([binary, image_path], env=env, check=True,
                              capture_output=True, timeout=300, text=True)
        for line in proc.stderr.splitlines():
            if line.startswith("DECODE_MS"):
                ms = float(line.split()[1])
                best = ms if best is None else min(best, ms)
    if best is None:
        raise RuntimeError("oracle produced no DECODE_MS line")
    return best


def run(image_path: str, cache: bool = True) -> OracleDump:
    """Run the oracle on an image, caching dumps next to the binary."""
    binary = build()
    name = os.path.splitext(os.path.basename(image_path))[0]
    prefix = os.path.join(CACHE_DIR, name)
    if not (cache and os.path.exists(prefix + ".coeff.bin")
            and os.path.exists(prefix + ".rgb.bin")):
        env = dict(os.environ, DUMP_PREFIX=prefix)
        subprocess.run([binary, image_path], env=env, check=True,
                       capture_output=True, timeout=300)
    return OracleDump(prefix)
