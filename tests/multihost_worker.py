"""Worker process for the multi-host (2-process CPU) sharding test.

Usage: python multihost_worker.py <process_id> <num_processes> <port>

Each process contributes 4 virtual CPU devices to a global (2, 4) mesh and
runs the single-jit full decode step on a 4-image batch of img4.jpg with
images sharded across processes and restart segments across local devices.
Each process validates its addressable output shards against the bit-exact
host decoder and prints MULTIHOST_OK on success.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jpeg_decoder_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

import numpy as np  # noqa: E402

from jpeg_decoder_tpu.entropy import python_ref  # noqa: E402
from jpeg_decoder_tpu.io import parser  # noqa: E402
from jpeg_decoder_tpu.ops import entropy_jax, pixel as pixel_ops  # noqa: E402
from jpeg_decoder_tpu import layout as layout_mod  # noqa: E402
from jpeg_decoder_tpu.parallel import sharded  # noqa: E402

mesh = multihost.global_mesh()
assert dict(mesh.shape) == {"data": 2, "seg": 4}, mesh.shape

path = "/root/reference/images/img4.jpg"
hdr = parser.parse_file(path)
words, nm, _bc, _mm, lay = entropy_jax.prepare_scan(hdr, hdr.scans[0])
B = 4
rgb, err = sharded.full_decode_step(
    hdr, np.stack([words] * B), np.stack([nm] * B), mesh,
    idct="fast", upsample="nn")

# Expected output from the bit-exact host decoder.
scan_coefs = python_ref.decode_scan_baseline(hdr, hdr.scans[0])
planes = tuple(
    scan_coefs[lay.comp_src[ci]].reshape(*lay.comp_shapes[ci], 64)
    for ci in range(3))
qts = tuple(hdr.quant_tables[c.tq].values for c in hdr.components)
expected = np.asarray(pixel_ops.pixel_pipeline(
    planes, qts, height=hdr.height, width=hdr.width,
    samplings=((1, 1), (1, 1), (1, 1)), idct="fast", upsample="nn"))

ok = True
for shard in rgb.addressable_shards:
    got = np.asarray(shard.data)
    for row in range(got.shape[0]):
        if not np.array_equal(got[row], expected):
            ok = False

for shard in err.addressable_shards:
    if np.asarray(shard.data).any():
        ok = False

print("MULTIHOST_OK" if ok else "MULTIHOST_MISMATCH", flush=True)
sys.exit(0 if ok else 1)
