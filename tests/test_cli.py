"""CLI smoke tests: single-image, --batch, and --batch --device-entropy
paths produce identical pixels and honor per-image isolation."""

import io
import os
import sys

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu import cli


def _write_jpegs(tmp_path, n=2):
    rng = np.random.default_rng(3)
    paths = []
    for i in range(n):
        w, h = 96 + 16 * i, 80 + 8 * i
        base = rng.integers(0, 255, size=(h // 8 + 1, w // 8 + 1, 3))
        rgb = np.kron(base, np.ones((8, 8, 1)))[:h, :w].astype(np.uint8)
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(rgb).save(p, "JPEG", quality=88)
        paths.append(str(p))
    return paths


def _run(argv):
    old = sys.argv
    sys.argv = ["jpeg_decoder_tpu"] + argv
    try:
        return cli.main()
    finally:
        sys.argv = old


def test_cli_three_paths_agree(tmp_path):
    paths = _write_jpegs(tmp_path)
    outs = {}
    for mode, extra in (("single", []),
                        ("batch", ["--batch"]),
                        ("device", ["--batch", "--device-entropy"])):
        outdir = tmp_path / mode
        outdir.mkdir()
        rc = _run(["--platform", "cpu", "--idct", "fast",
                   "--upsample", "nn", "-o", str(outdir),
                   "--format", "png"] + extra + paths)
        assert rc == 0, mode
        outs[mode] = [np.array(Image.open(outdir / f"im{i}.png"))
                      for i in range(len(paths))]
    for i in range(len(paths)):
        assert np.array_equal(outs["single"][i], outs["batch"][i]), i
        assert np.array_equal(outs["single"][i], outs["device"][i]), i


def test_cli_batch_isolates_bad_input(tmp_path):
    paths = _write_jpegs(tmp_path, n=1)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8not-a-jpeg")
    outdir = tmp_path / "out"
    outdir.mkdir()
    rc = _run(["--platform", "cpu", "--batch", "--device-entropy",
               "-o", str(outdir), paths[0], str(bad)])
    assert rc == 1  # the bad input errored...
    assert (outdir / "im0.png").exists()  # ...but the good one decoded
