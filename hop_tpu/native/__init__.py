"""Native (C++) host-side components, bound via ctypes.

Compiled on first import with g++ (no pip/pybind11 dependency); artifacts
are cached next to the sources. Import failures degrade gracefully — every
consumer has a numpy fallback.
"""
