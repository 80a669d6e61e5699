"""JPEGDecoder — the flagship end-to-end decode pipeline.

Orchestrates: host parse (io.parser) -> entropy decode (selectable backend:
pure-Python reference, native C++, or on-device Pallas) -> device pixel
pipeline (ops.pixel / ops.idct_pallas) -> RGB array / file output.

This is the TPU-build analogue of the reference's ``Image`` class plus
``process_image_data`` (jpeg.cpp:19-914, 755-789), re-architected so each
stage boundary (the coefficient plane) is identical across backends and thus
swappable — the property the conformance tests pin down.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import layout as layout_mod
from ..io import parser
from ..ops import pixel as pixel_ops
from ..types import FrameHeader, JPEGError


@dataclasses.dataclass
class DecodeResult:
    """Everything a caller (or a conformance test) may want."""

    header: FrameHeader
    rgb: np.ndarray  # (H, W, 3) uint8 (uint16 for 12-bit frames)
    # Dequantized per-component coefficient planes (rows, cols, 64) int32 —
    # the bit-exactness conformance surface.
    dequantized_planes: Optional[list[np.ndarray]] = None
    # Quantized (raw decoded) planes, pre-dequantization.
    quantized_planes: Optional[list[np.ndarray]] = None


def _entropy_backend(name: str):
    """Resolve an entropy-decode backend by name.

    * ``python``  — bit-exact pure-Python LUT decoder (slow; oracle grade).
    * ``native``  — multi-threaded C++ host decoder via ctypes (fast host).
    * ``jax``     — on-device block-lockstep decoder (ops/entropy_flat):
      restart segments decode as parallel lanes; DRI=0 streams decode via
      the speculative chunk-parallel path (ops/entropy_spec).
    * ``speculative`` — native C++ with chunk-parallel self-synchronizing
      decode for DRI=0 streams (segment-threaded otherwise).
    * ``hybrid``  — host skeleton scan (native, position-only) + on-device
      lanes decoding from TRUE MCU starts: the fastest device path for
      DRI=0 streams (no speculative overflow/skew tax); restart streams
      take the plain lockstep path.
    * ``pallas``  — on-device Pallas kernel (VMEM-resident LUTs/stream).
    * ``auto``    — native if built, else python.
    """
    if name == "python":
        from ..entropy import python_ref
        return python_ref.decode_scan_baseline
    if name == "native":
        from ..entropy import native
        return native.decode_scan_baseline
    if name == "speculative":
        from ..entropy import native

        def spec(hdr, scan):
            if len(scan.seg_offsets) == 2:
                return native.decode_scan_speculative(hdr, scan)
            return native.decode_scan_baseline(hdr, scan)
        return spec
    if name == "jax":
        from ..ops import entropy_flat, entropy_spec

        def device(hdr, scan):
            # Blocks stay device-resident: the pixel pipeline consumes
            # them in place; only error flags / the splice trace cross
            # the (slow, tunnel-attached) host link.
            if len(scan.seg_offsets) == 2 and not scan.restart_interval:
                return entropy_spec.decode_scan_speculative(
                    hdr, scan, as_device=True)
            return entropy_flat.decode_scan_baseline(
                hdr, scan, as_device=True)
        return device
    if name == "hybrid":
        from ..ops import entropy_flat, entropy_spec

        def hybrid(hdr, scan):
            if len(scan.seg_offsets) == 2 and not scan.restart_interval:
                return entropy_spec.decode_scan_hybrid(hdr, scan,
                                                       as_device=True)
            return entropy_flat.decode_scan_baseline(
                hdr, scan, as_device=True)
        return hybrid
    if name == "pallas":
        from ..ops import entropy_pallas
        return entropy_pallas.decode_scan_baseline
    if name == "auto":
        try:
            from ..entropy import native
            nat = native.decode_scan_baseline if native.available() else None
        except Exception:
            nat = None
        from ..entropy import python_ref

        def auto(hdr, scan):
            # jd_decode_scan handles both 8-bit and precision-12 frames
            # (T.81 B.2.2 size categories; VERDICT r3 item 6).
            if nat is not None and hdr.precision in (8, 12):
                return nat(hdr, scan)
            return python_ref.decode_scan_baseline(hdr, scan)
        return auto
    raise ValueError(f"unknown entropy backend {name!r}")


def segment_mismatch(hdr: FrameHeader, scan) -> bool:
    """True when the stream's restart-segment count disagrees with DRI —
    a corrupted/nonconforming stream the strict backends reject."""
    ri = scan.restart_interval
    n_mcus = layout_mod.scan_layout(hdr).n_mcus
    expected = -(-n_mcus // ri) if ri else 1
    return len(scan.seg_offsets) - 1 != expected


def _decode_scan_robust(hdr: FrameHeader, scan, entropy: str):
    """Backend dispatch with libjpeg-style restart resynchronization:
    RST-count/DRI mismatches decode best-effort (marker positions are
    ground truth) instead of raising — parity with libjpeg, which keeps
    going where the reference exits (VERDICT r1 item 7)."""
    if segment_mismatch(hdr, scan):
        import logging

        logging.getLogger(__name__).warning(
            "restart-segment count %d disagrees with DRI %d; "
            "resynchronizing on marker positions (best-effort decode)",
            len(scan.seg_offsets) - 1, scan.restart_interval)
        # Native resilient decode keeps corrupt streams at clean-stream
        # cost in a serving batch (VERDICT r2 item 6); the Python path is
        # the oracle and the non-8-bit fallback.
        if (entropy in ("auto", "native", "speculative")
                and hdr.precision in (8, 12)):
            try:
                from ..entropy import native

                if native.available():
                    return native.decode_scan_resilient(hdr, scan)
            except Exception:  # noqa: BLE001
                pass
        from ..entropy import python_ref

        return python_ref.decode_scan_resilient(hdr, scan)
    return _entropy_backend(entropy)(hdr, scan)


def needs_scan_loop(hdr: FrameHeader) -> bool:
    """True when the frame cannot use the fast single-interleaved-scan
    path: multiple scans, a partial-component scan, or a single-component
    frame with sampling factors > 1 — T.81 A.2.2 makes ANY
    single-component scan non-interleaved (one data unit per MCU over the
    component's unpadded block grid), which changes both block order and
    restart-interval accounting whenever h*v > 1."""
    if len(hdr.scans) != 1:
        return True
    s0 = hdr.scans[0]
    if len(s0.comp_indices) != len(hdr.components):
        return True
    if len(hdr.components) == 1:
        c = hdr.components[0]
        if (c.h, c.v) != (1, 1):
            return True
    return False


def decode_to_planes(hdr: FrameHeader, entropy: str = "auto"):
    """Run entropy decode for all scans, returning per-component quantized
    coefficient planes (rows, cols, 64) int32."""
    if hdr.arithmetic:
        # SOF9/SOF10 (T.81 Annex D/F arithmetic coding) — capability
        # beyond both the reference and PIL's encoder; same coefficient-
        # plane boundary as every other backend.
        from ..entropy import arith
        return arith.decode_to_planes(hdr)
    if hdr.progressive:
        if entropy in ("jax", "hybrid", "pallas"):
            # Device-lane progressive decode (ops/entropy_prog): scan
            # kinds run as lockstep device kernels; lanes from restart
            # segments or the native skeleton scan (VERDICT r3 item 2).
            from ..ops import entropy_prog

            return entropy_prog.decode_progressive_lanes(hdr)
        if entropy in ("auto", "native") and hdr.precision == 8:
            try:
                from ..entropy import native

                if native.available():
                    return native.decode_progressive(hdr)
            except Exception:
                pass
        from ..entropy import progressive
        return progressive.decode_progressive(hdr)
    if needs_scan_loop(hdr):
        # T.81 sequential multi-scan / partial-scan frames (one scan per
        # component subset, non-interleaved when single-component) — legal
        # but rare; the reference accepts only the single interleaved scan
        # (jpeg.cpp:858-862).  Decoded via the oracle-grade Python path.
        use_native = False
        if entropy in ("auto", "native", "speculative") and hdr.precision == 8:
            try:
                from ..entropy import native

                use_native = native.available()
            except Exception:  # noqa: BLE001
                use_native = False
        from ..entropy import python_ref

        lay = layout_mod.scan_layout(hdr)
        planes = [np.zeros((*lay.comp_shapes[ci], 64), np.int32)
                  for ci in range(len(hdr.components))]
        seen: set[int] = set()
        for scan in hdr.scans:
            dup = seen.intersection(scan.comp_indices)
            if dup:
                raise JPEGError(
                    f"sequential frame codes components {sorted(dup)} twice")
            if use_native:
                from ..entropy import native

                sc = scan.comp_indices
                blocks = native.decode_scan_subset(hdr, scan)
                if len(sc) == 1:
                    rows_u, cols_u = layout_mod.comp_dims_unpadded(
                        hdr, sc[0])
                    planes[sc[0]][:rows_u, :cols_u] = blocks.reshape(
                        rows_u, cols_u, 64)
                else:
                    slay = layout_mod.scan_layout(
                        hdr, comp_indices=tuple(sc))
                    for k_c, ci in enumerate(sc):
                        rows, cols = slay.comp_shapes[k_c]
                        planes[ci][:] = blocks[slay.comp_src[k_c]].reshape(
                            rows, cols, 64)
            else:
                python_ref.decode_scan_sequential_into(hdr, scan, planes)
            seen.update(scan.comp_indices)
        missing = set(range(len(hdr.components))) - seen
        if missing:
            raise JPEGError(
                f"sequential frame never codes components {sorted(missing)}")
        return planes
    scan = hdr.scans[0]
    scan_coefs = _decode_scan_robust(hdr, scan, entropy)
    lay = layout_mod.scan_layout(hdr)
    planes = []
    for ci in range(len(hdr.components)):
        rows, cols = lay.comp_shapes[ci]
        planes.append(np.asarray(scan_coefs)[lay.comp_src[ci]]
                      .reshape(rows, cols, 64))
    return planes


def apply_exif_orientation(arr: np.ndarray, orientation: int | None) -> np.ndarray:
    """Apply an EXIF orientation (1-8) to an (H, W, C) array, matching
    ``PIL.ImageOps.exif_transpose`` (validated in tests/test_metadata.py)."""
    if orientation is None or orientation == 1:
        return arr
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1]
    if orientation == 5:
        return arr.transpose(1, 0, 2)
    if orientation == 6:
        return np.rot90(arr, k=3)
    if orientation == 7:
        return arr.transpose(1, 0, 2)[::-1, ::-1]
    if orientation == 8:
        return np.rot90(arr, k=1)
    return arr


def decode(source, *, entropy: str = "auto", idct: str = "exact",
           upsample: str = "nn", keep_planes: bool = False, device=None,
           strict: bool = False, colorspace: str = "rgb",
           orientation: str = "ignore") -> DecodeResult:
    """Decode a JPEG from a path or bytes to RGB.

    Args:
      source: file path or bytes-like JPEG stream.
      entropy: entropy backend ("auto" | "python" | "native" | "pallas").
      idct: "exact" (reference AAN f32 semantics), "fast" (MXU einsum),
        "kron" (fused dequant+IDCT as one MXU matmul), or "pallas" (the
        Pallas kernel form of "kron"; TPU only — mapped to "kron"
        elsewhere).
      upsample: "nn" (reference nearest-neighbor parity) or "fancy"
        (libjpeg triangular filter — higher quality, matches PIL closely).
      keep_planes: also return the coefficient planes (conformance surface).
      device: optional jax.Device to place pixel-pipeline work on.
      strict: run the pixel pipeline eagerly (no XLA fusion) so every f32 op
        rounds individually — byte-perfect parity with the reference C++.
        Jitted mode may differ by at most 1 count on rare truncation
        boundaries (FMA contraction inside fusions).
      colorspace: "rgb" (default; CMYK/YCCK sources are converted with
        Pillow's exact cmyk2rgb arithmetic) or "cmyk" (4-component sources
        only: return the (H, W, 4) CMYK plane, PIL-inverted convention).
      orientation: "ignore" (default — return sensor-order pixels, like
        libjpeg) or "respect" (apply the EXIF orientation tag, like
        PIL.ImageOps.exif_transpose).
    """
    if isinstance(source, (bytes, bytearray, np.ndarray)):
        hdr = parser.parse(source)
    else:
        hdr = parser.parse_file(source)

    qtables = tuple(
        jnp.asarray(hdr.quant_tables[c.tq].values) for c in hdr.components
    )
    samplings = tuple(
        (hdr.v_max // c.v, hdr.h_max // c.h) for c in hdr.components
    )
    color = hdr.colorspace
    out_cmyk = colorspace == "cmyk"
    if out_cmyk and color not in ("ycck", "cmyk"):
        raise JPEGError(
            f"colorspace='cmyk' requires a 4-component source, got {color}")

    planes = None
    if (hdr.progressive or hdr.arithmetic or needs_scan_loop(hdr)
            or keep_planes or strict):
        # Conformance / multi-scan path: assemble planes on host.
        planes = decode_to_planes(hdr, entropy=entropy)
        jplanes = tuple(jnp.asarray(p) for p in planes)
        if device is not None:
            jplanes = tuple(jax.device_put(p, device) for p in jplanes)
            qtables = tuple(jax.device_put(q, device) for q in qtables)
        pipeline = (pixel_ops.pixel_pipeline_impl if strict
                    else pixel_ops.pixel_pipeline)
        rgb = pipeline(
            jplanes, qtables,
            height=hdr.height, width=hdr.width,
            samplings=samplings, idct=idct, upsample=upsample,
            color=color, out_cmyk=out_cmyk, precision=hdr.precision,
        )
    else:
        # Production path: ship scan-order blocks verbatim; plane assembly
        # is a device-side gather inside the fused pipeline.
        scan_coefs = _decode_scan_robust(hdr, hdr.scans[0], entropy)
        lay = layout_mod.scan_layout(hdr)
        blocks = (scan_coefs if isinstance(scan_coefs, jax.Array)
                  else jnp.asarray(np.asarray(scan_coefs)))
        comp_srcs = _comp_srcs_jax(lay)
        if device is not None:
            blocks = jax.device_put(blocks, device)
        rgb = pixel_ops.pixel_pipeline_from_scan(
            blocks, qtables, comp_srcs,
            comp_shapes=tuple(lay.comp_shapes),
            height=hdr.height, width=hdr.width,
            samplings=samplings, idct=idct, upsample=upsample,
            color=color, out_cmyk=out_cmyk, precision=hdr.precision,
        )

    rgb_np = np.asarray(rgb)
    if orientation == "respect":
        rgb_np = np.ascontiguousarray(
            apply_exif_orientation(rgb_np, hdr.exif_orientation))
    result = DecodeResult(header=hdr, rgb=rgb_np)
    if keep_planes:
        result.quantized_planes = [np.asarray(p) for p in planes]
        result.dequantized_planes = [
            np.asarray(p) * hdr.quant_tables[c.tq].values
            for p, c in zip(planes, hdr.components)
        ]
    return result


_COMP_SRC_CACHE: dict[int, tuple] = {}


def _comp_srcs_jax(lay) -> tuple:
    """Device-resident gather maps, uploaded once per geometry."""
    key = id(lay)  # ScanLayout instances are cached per geometry
    hit = _COMP_SRC_CACHE.get(key)
    if hit is None:
        hit = tuple(jnp.asarray(src) for src in lay.comp_src)
        _COMP_SRC_CACHE[key] = hit
    return hit


def decode_to_file(source, out_path, **kw) -> DecodeResult:
    from ..io import writers

    res = decode(source, **kw)
    writers.write_image(out_path, res.rgb)
    return res
