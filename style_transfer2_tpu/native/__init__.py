"""Native (C++) host-side components, loaded via ctypes.

Build with ``make -C native`` at the repo root. Pure-Python/PIL fallbacks
engage automatically when the shared library is absent.
"""
