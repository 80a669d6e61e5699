"""decode_batch_sharded per-image host fallback (VERDICT r3 item 3).

Frames the device lanes don't cover (progressive / arithmetic / 12-bit /
multi-scan) must decode through the BatchDecoder host path per image —
NOT return BatchItem.error — so a mixed corpus errors only on genuinely
undecodable blobs.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from encoder import encode  # noqa: E402

from conftest import corpus_path  # noqa: E402
from jpeg_decoder_tpu import decode  # noqa: E402
from jpeg_decoder_tpu.io import parser  # noqa: E402
from jpeg_decoder_tpu.parallel import mesh as mesh_mod  # noqa: E402
from jpeg_decoder_tpu.parallel.sharded import decode_batch_sharded  # noqa: E402


@pytest.fixture(scope="module")
def mesh18():
    return mesh_mod.make_mesh((1, 8), ("data", "seg"))


def _gradient_rgb(h, w, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(h // 16 + 1, w // 16 + 1, 3))
    return np.kron(base, np.ones((16, 16, 1)))[:h, :w].astype(np.uint8)


def test_mixed_batch_one_error(mesh18):
    """The VERDICT done-criterion: baseline + progressive + arithmetic +
    12-bit + multi-scan + corrupt -> exactly one error (the corrupt blob)."""
    rgb = _gradient_rgb(64, 80)
    baseline = open(corpus_path("img2.jpg"), "rb").read()
    progressive = open(corpus_path("prograssive-sample-2.jpg"), "rb").read()
    arith, _ = encode(rgb, samplings=((1, 1),) * 3, arithmetic=True)
    twelve, _ = encode(rgb, samplings=((1, 1),) * 3, precision=12)
    multiscan, _ = encode(rgb, samplings=((1, 1),) * 3,
                          scans=[(0,), (1, 2)])
    corrupt = b"\xff\xd8not-a-jpeg"

    assert parser.parse(progressive).progressive
    assert parser.parse(arith).arithmetic
    assert parser.parse(twelve).precision == 12
    assert len(parser.parse(multiscan).scans) == 2

    blobs = [baseline, progressive, arith, twelve, multiscan, corrupt]
    items = decode_batch_sharded(blobs, mesh18, idct="fast",
                                 upsample="fancy")
    errors = [it for it in items if it.error is not None]
    assert len(errors) == 1 and errors[0].index == 5, (
        [(it.index, it.error) for it in errors])

    # Each fallback image matches its single-image decode bit-exactly
    # (same host entropy + device pixel arithmetic).
    for it, blob in zip(items[:5], blobs[:5]):
        ref = decode(blob, idct="fast", upsample="fancy").rgb
        got = np.asarray(it.rgb)
        assert got.shape == ref.shape, it.index
        assert np.array_equal(got, ref), it.index


def test_fallback_isolation_inside_host_batch(mesh18):
    """A corrupt blob inside the host-fallback subset fails alone."""
    rgb = _gradient_rgb(48, 48, seed=9)
    arith, _ = encode(rgb, samplings=((1, 1),) * 3, arithmetic=True)
    baseline = open(corpus_path("img2.jpg"), "rb").read()
    # Truncate the arithmetic stream mid-entropy: parses, then fails decode.
    bad = arith[: len(arith) // 2]
    items = decode_batch_sharded([baseline, arith, bad], mesh18,
                                 idct="fast", upsample="nn")
    assert items[0].error is None
    assert items[1].error is None
    ref = decode(arith, idct="fast", upsample="nn").rgb
    assert np.array_equal(np.asarray(items[1].rgb), ref)


def test_corrupt_progressive_isolated(mesh18):
    """A truncated progressive stream through decode_batch_sharded is
    isolated (error or best-effort) and neighbors stay exact."""
    from conftest import corpus_path as cp

    good = open(cp("prograssive-sample-2.jpg"), "rb").read()
    base = open(cp("img2.jpg"), "rb").read()
    # Cut the middle of the entropy region: still parseable.
    sos = good.find(b"\xff\xda")
    eoi = good.rfind(b"\xff\xd9")
    cut_a = sos + (eoi - sos) // 3
    cut_b = sos + 2 * (eoi - sos) // 3
    bad = good[:cut_a] + good[cut_b:]
    items = decode_batch_sharded([base, bad, good], mesh18,
                                 idct="fast", upsample="nn")
    ref_base = decode(base, idct="fast", upsample="nn").rgb
    assert items[0].error is None
    assert np.array_equal(np.asarray(items[0].rgb), ref_base)
    ref_good = decode(good, idct="fast", upsample="nn").rgb
    assert items[2].error is None
    assert np.array_equal(np.asarray(items[2].rgb), ref_good)
    # The corrupt one either errors cleanly or decodes best-effort with
    # the right shape — never poisons the batch.
    if items[1].error is None:
        assert np.asarray(items[1].rgb).shape == ref_good.shape
