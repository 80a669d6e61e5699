from .decoder import DecodeResult, decode, decode_to_file  # noqa: F401
