"""Native (C++) runtime components, loaded via ctypes.

Built on demand with g++ (no pybind11 in this image); the compiled shared
object is cached next to the sources. All native components have pure-python
fallbacks, so the package works without a compiler.
"""

from emap_tpu.native.loader import connect_points_native, native_available

__all__ = ["connect_points_native", "native_available"]
