"""Native (C++) runtime components, loaded via ctypes.

Build with `python -m bowtie_tpu.native.build` (or it happens lazily on
first use).  Everything here has a pure-Python fallback so the
framework works without a compiler.
"""
from .build import load_native  # noqa: F401
