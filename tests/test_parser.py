"""Unit tests: marker parsing, header semantics, entropy unstuffing.

Hand-built byte arrays per SURVEY.md §4.1; parity targets cited per case."""

import numpy as np
import pytest

from conftest import CORPUS, PROGRESSIVE_CORPUS, corpus_path
from jpeg_decoder_tpu.io import parser
from jpeg_decoder_tpu.types import JPEGError, ZIGZAG


# ---------------------------------------------------------------------------
# Unstuffer (parity: JPEGFile::readImageData, file.hpp:59-104)
# ---------------------------------------------------------------------------

def _unstuff(raw: bytes):
    data = np.frombuffer(raw, dtype=np.uint8)
    clean, segs, end = parser.unstuff_entropy(data, 0)
    return bytes(clean), segs.tolist(), end


def test_unstuff_plain():
    clean, segs, end = _unstuff(b"\x01\x02\x03\xff\xd9")
    assert clean == b"\x01\x02\x03"
    assert segs == [0, 3]
    assert end == 3


def test_unstuff_stuffed_ff00():
    clean, segs, end = _unstuff(b"\x01\xff\x00\x02\xff\xd9")
    assert clean == b"\x01\xff\x02"


def test_unstuff_fill_ff_before_marker():
    # FF FF 00 collapses to one FF kept (reference 'continue' path,
    # file.hpp:88-90)
    clean, _, _ = _unstuff(b"\xff\xff\x00\x01\xff\xd9")
    assert clean == b"\xff\x01"


def test_unstuff_rst_segments():
    clean, segs, _ = _unstuff(b"\x01\x02\xff\xd0\x03\x04\xff\xd1\x05\xff\xd9")
    assert clean == b"\x01\x02\x03\x04\x05"
    assert segs == [0, 2, 4, 5]


def test_unstuff_zero_after_stuffed_zero():
    # FF 00 00: the second 00 is plain data
    clean, _, _ = _unstuff(b"\xff\x00\x00\xff\xd9")
    assert clean == b"\xff\x00"


def test_unstuff_terminates_on_next_marker():
    clean, _, end = _unstuff(b"\x01\x02\xff\xc4\x00\x04\x00\x00")
    assert clean == b"\x01\x02"
    assert end == 2


# ---------------------------------------------------------------------------
# Header parsing on hand-built streams
# ---------------------------------------------------------------------------

def _minimal_jpeg(sof_marker=0xC0, dqt_precision16=False):
    """A tiny syntactically-valid 8x8 grayscale-ish 3-component JPEG."""
    out = bytearray(b"\xff\xd8")
    # DQT: table 0, all ones
    vals = bytes(64) if not dqt_precision16 else bytes(128)
    body = bytes([0x10 if dqt_precision16 else 0x00])
    if dqt_precision16:
        body += b"".join(b"\x01\x02" for _ in range(64))  # value 0x0102
    else:
        body += bytes([1] * 64)
    out += b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body
    # SOF: 8x8, 3 comps, 1x1 sampling
    sof = bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes([3])
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    out += bytes([0xFF, sof_marker]) + (len(sof) + 2).to_bytes(2, "big") + sof
    # DHT: DC table 0 with one 1-bit code for symbol 0 (DC size 0);
    #      AC table 0 with one 1-bit code for symbol 0x00 (EOB)
    dht = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0])
    dht += bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
    out += b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    # SOS
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x00, 3, 0x00]) + bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    # Entropy data: 3 components x (DC sym 0 -> 1 bit '0', EOB -> 1 bit '0')
    # = 6 zero bits, pad with 1s -> one byte 0b00000011
    out += bytes([0b00000011])
    out += b"\xff\xd9"
    return bytes(out)


def test_parse_minimal():
    hdr = parser.parse(_minimal_jpeg())
    assert (hdr.width, hdr.height) == (8, 8)
    assert not hdr.progressive
    assert len(hdr.components) == 3
    assert hdr.mcu_width == hdr.mcu_height == 1
    assert hdr.mcus_x == hdr.mcus_y == 1
    assert len(hdr.scans) == 1
    assert hdr.scans[0].data.tolist() == [0b00000011]


def test_parse_progressive_flag():
    hdr = parser.parse(_minimal_jpeg(sof_marker=0xC2))
    assert hdr.progressive


def test_dqt_16bit_no_truncation():
    # Reference truncates 16-bit DQT entries to 8 bits (jpeg.cpp:213-219);
    # we must keep the full value 0x0102 = 258.
    hdr = parser.parse(_minimal_jpeg(dqt_precision16=True))
    assert hdr.quant_tables[0].values.max() == 0x0102


def test_dqt_dezigzag():
    # DQT stores raw zigzag order; natural order must be de-zigzagged
    out = bytearray(b"\xff\xd8")
    body = bytes([0x00]) + bytes(range(64))
    out += b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body
    rest = _minimal_jpeg()[2:]  # reuse tail (has its own DQT for table 0)
    # parse only our DQT by appending SOF/DHT/SOS from minimal
    hdr = parser.parse(bytes(out) + rest[rest.index(b"\xff\xc0"):]
                       if False else _minimal_jpeg())
    # direct check of the helper instead:
    qt = {}
    parser._parse_dqt(np.frombuffer(body, np.uint8), qt)
    natural = qt[0].values
    assert natural[ZIGZAG].tolist() == list(range(64))


def test_not_a_jpeg():
    with pytest.raises(JPEGError):
        parser.parse(b"\x89PNG\r\n")


def test_truncated_segment():
    bad = _minimal_jpeg()[:10]
    with pytest.raises(JPEGError):
        parser.parse(bad)


# ---------------------------------------------------------------------------
# Corpus sanity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", CORPUS)
def test_parse_corpus_baseline(name):
    hdr = parser.parse_file(corpus_path(name))
    assert not hdr.progressive
    assert len(hdr.scans) == 1
    assert hdr.scans[0].data is not None and len(hdr.scans[0].data) > 0
    if name == "img4.jpg":
        assert hdr.restart_interval == 100
        assert len(hdr.scans[0].seg_offsets) - 1 == 50
        assert (hdr.h_max, hdr.v_max) == (1, 1)  # 4:4:4
    else:
        assert hdr.restart_interval == 0
        assert len(hdr.scans[0].seg_offsets) - 1 == 1


@pytest.mark.parametrize("name", PROGRESSIVE_CORPUS)
def test_parse_corpus_progressive(name):
    hdr = parser.parse_file(corpus_path(name))
    assert hdr.progressive
    assert len(hdr.scans) > 1
    for scan in hdr.scans:
        assert scan.data is not None


def test_geometry_img():
    # img.jpg: 679x451 4:2:0 -> mcuWidth 85, mcuHeight 57, padded 86x58
    # (parity: jpeg.cpp:77-80, 118-125)
    hdr = parser.parse_file(corpus_path("img.jpg"))
    assert (hdr.mcu_width, hdr.mcu_height) == (85, 57)
    assert (hdr.mcu_width_real, hdr.mcu_height_real) == (86, 58)
    assert (hdr.h_max, hdr.v_max) == (2, 2)


def test_zero_based_component_ids():
    # Reference quirk (jpeg.cpp:91-104): some encoders number components
    # 0,1,2 instead of 1,2,3.  Patch a PIL-encoded image's SOF/SOS ids.
    import io as _io
    from PIL import Image as _Image

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (6, 6, 3)).astype(np.uint8)
    buf = _io.BytesIO()
    _Image.fromarray(np.asarray(_Image.fromarray(base).resize((48, 40)))
                     ).save(buf, "JPEG", quality=90, subsampling=0)
    data = bytearray(buf.getvalue())

    # SOF0 segment: find FF C0; ids at offsets +10, +13, +16 from marker.
    i = bytes(data).find(b"\xff\xc0")
    assert i > 0
    for k in range(3):
        off = i + 10 + 3 * k
        assert data[off] == k + 1
        data[off] = k
    # SOS segment: ids at +5, +7, +9.
    j = bytes(data).find(b"\xff\xda")
    for k in range(3):
        off = j + 5 + 2 * k
        assert data[off] == k + 1
        data[off] = k

    hdr = parser.parse(bytes(data))
    assert hdr.zero_based_ids
    from jpeg_decoder_tpu import decode

    ref = decode(buf.getvalue(), entropy="python", idct="fast").rgb
    got = decode(bytes(data), entropy="python", idct="fast").rgb
    assert np.array_equal(ref, got)


# ---------------------------------------------------------------------------
# Native C++ unstuffer vs NumPy reference
# ---------------------------------------------------------------------------

def test_native_unstuffer_matches_numpy():
    import numpy as np
    import pytest as _pytest

    from jpeg_decoder_tpu.entropy import native
    from jpeg_decoder_tpu.io import parser as P

    if not native.available():
        _pytest.skip("native backend unavailable")
    cases = [
        b"\x12\x34\xff\x00\x56\xff\xd9",
        b"\xff\xff\xff\x00\xff\xd0\xab\xff\xd9",
        b"\xff\xd0\xff\xd1\xff\xd9",           # RST at 0, empty segs
        b"\x01\x02\xff",                          # trailing lone FF
        b"\xab\xff\xff\xd9",                     # fill byte then EOI
        bytes(range(256)) * 3 + b"\xff\xd9",
    ]
    rng = np.random.default_rng(7)
    for _ in range(40):  # randomized streams, FF-rich
        n = int(rng.integers(1, 400))
        buf = rng.integers(0, 256, n, dtype=np.uint8)
        buf[rng.random(n) < 0.3] = 0xFF
        cases.append(bytes(buf) + b"\xff\xd9")
    for c in cases:
        d = np.frombuffer(c, np.uint8)
        a = native.unstuff(d, 0)
        b = P.unstuff_entropy_numpy(d, 0)
        np.testing.assert_array_equal(a[0], b[0], err_msg=repr(c[:20]))
        np.testing.assert_array_equal(a[1], b[1], err_msg=repr(c[:20]))
        assert a[2] == b[2], c[:20]


def test_native_unstuffer_no_terminator_raises():
    import numpy as np
    import pytest as _pytest

    from jpeg_decoder_tpu.entropy import native
    from jpeg_decoder_tpu.types import JPEGError

    if not native.available():
        _pytest.skip("native backend unavailable")
    with _pytest.raises(JPEGError):
        native.unstuff(np.frombuffer(b"\x01\x02\x03", np.uint8), 0)


def test_dnl_defines_height():
    """SOF with 0 lines + a DNL segment after the scan (T.81 B.2.5)
    decodes identically to the same stream with the height in SOF —
    beyond both the reference (exits) and libjpeg (unsupported)."""
    import struct

    from jpeg_decoder_tpu import decode
    from tools.encoder import encode

    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (56, 72, 3), np.uint8)
    blob, _ = encode(rgb, samplings=((2, 2), (1, 1), (1, 1)),
                     restart_interval=3)
    sof = blob.find(b"\xff\xc0")
    h = struct.unpack(">H", blob[sof + 5: sof + 7])[0]
    patched = bytearray(blob)
    patched[sof + 5: sof + 7] = b"\x00\x00"
    eoi = bytes(patched).rfind(b"\xff\xd9")
    dnl = b"\xff\xdc" + struct.pack(">HH", 4, h)
    patched = bytes(patched[:eoi]) + dnl + bytes(patched[eoi:])
    assert np.array_equal(decode(patched).rgb, decode(blob).rgb)
    # Without the DNL the stream is undecodable: clear error, not garbage.
    bad = bytearray(blob)
    bad[sof + 5: sof + 7] = b"\x00\x00"
    with pytest.raises(JPEGError):
        decode(bytes(bad))
