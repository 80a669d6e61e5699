from . import parser, writers  # noqa: F401
