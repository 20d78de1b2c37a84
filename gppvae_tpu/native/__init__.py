"""Native (C++) data-plane components, bound via ctypes.

Built lazily on first use (g++ is in the image; pybind11 is not — ctypes is
the binding layer). Every native entry point has a pure-numpy fallback in
gppvae_tpu/data/transforms.py; parity is tested. Disable with
GPPVAE_NO_NATIVE=1.
"""

from gppvae_tpu.native.build import get_lib, native_available
from gppvae_tpu.native.api import rotate_bilinear_native

__all__ = ["get_lib", "native_available", "rotate_bilinear_native"]
