"""jpeg_decoder_tpu — a TPU-native JPEG decode engine (JAX/XLA/Pallas).

Brand-new framework with the capabilities of the reference C++ decoder
(aswanthabam/JPEG_Decoder), re-architected TPU-first: host-side marker/header
parsing and byte-unstuffing, table-driven Huffman entropy decode (host C++ or
on-device Pallas, segment-parallel over restart intervals), and fused
dequantize + IDCT + chroma-upsample + YCbCr->RGB device kernels, sharded over
{images x segments} meshes via shard_map.
"""

from .models.decoder import DecodeResult, decode, decode_to_file  # noqa: F401
from .io.parser import parse, parse_file  # noqa: F401
from .types import FrameHeader, JPEGError  # noqa: F401

__version__ = "0.1.0"
