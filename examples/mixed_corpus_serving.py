"""Example: the r4 serving shape — one API for an arbitrary mixed corpus.

``decode_batch_sharded`` takes raw JPEG bytes of ANY mix — sizes,
restart intervals, baseline and progressive, even corrupt blobs — and
returns device-resident RGB per image:

* baseline frames decode with device entropy lanes, grouped by pow-2
  geometry BUCKET (an arbitrary-size corpus compiles O(log sizes)
  programs, not one per distinct size);
* progressive frames decode through the progressive scan kernels
  (planes never leave HBM);
* arithmetic / 12-bit / multi-scan frames fall back per image to the
  host entropy path;
* a corrupt blob fails ALONE (per-image isolation).

Run:  python examples/mixed_corpus_serving.py [n_virtual_devices]
"""

import io
import os
import sys

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
import re  # noqa: E402

_flags = os.environ.get("XLA_FLAGS", "")
_want = f"--xla_force_host_platform_device_count={N}"
if "--xla_force_host_platform_device_count" in _flags:
    _flags = re.sub(r"--xla_force_host_platform_device_count=\d+",
                    _want, _flags)
else:
    _flags = f"{_flags} {_want}"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from jpeg_decoder_tpu.parallel import mesh as mesh_mod  # noqa: E402
from jpeg_decoder_tpu.parallel.sharded import decode_batch_sharded  # noqa: E402


def blob(w, h, seed, **kw):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(h // 8 + 1, w // 8 + 1, 3))
    rgb = np.kron(base, np.ones((8, 8, 1)))[:h, :w].astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=88, **kw)
    return buf.getvalue()


def main():
    corpus = [
        blob(200, 150, 1),                             # baseline
        blob(137, 213, 2),                             # odd size, same bucket family
        blob(180, 120, 3, restart_marker_blocks=4),    # restart intervals
        blob(160, 160, 4, progressive=True),           # progressive
        b"\xff\xd8not-a-jpeg",                         # corrupt
        blob(96, 240, 5),
    ]
    mesh = mesh_mod.make_mesh((2, N // 2) if N % 2 == 0 else (1, N),
                              ("data", "seg"))
    items = decode_batch_sharded(corpus, mesh, idct="fast",
                                 upsample="fancy")
    for it in items:
        if it.error is not None:
            print(f"[{it.index}] FAILED (isolated): {it.error}")
        else:
            h, w = it.header.height, it.header.width
            print(f"[{it.index}] {w}x{h} "
                  f"{'progressive' if it.header.progressive else 'baseline'}"
                  f" -> device RGB {tuple(np.asarray(it.rgb).shape)}")
    n_err = sum(it.error is not None for it in items)
    assert n_err == 1, "only the corrupt blob may fail"
    print("mixed corpus served; 1 corrupt blob isolated")


if __name__ == "__main__":
    main()
