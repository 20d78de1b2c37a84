"""numpy-facing wrappers over the native library."""

from __future__ import annotations

import ctypes

import numpy as np

from gppvae_tpu.native.build import get_lib


def rotate_bilinear_native(images: np.ndarray, angles: np.ndarray) -> np.ndarray:
    """(B, H, W) float32 batch rotation via the C++ kernel.

    Raises RuntimeError if the native lib is unavailable — callers go
    through gppvae_tpu.data.transforms.rotate_bilinear, which falls back.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    images = np.ascontiguousarray(images, dtype=np.float32)
    angles = np.ascontiguousarray(
        np.broadcast_to(angles, images.shape[:1]), dtype=np.float32
    )
    B, H, W = images.shape
    out = np.empty_like(images)
    fptr = ctypes.POINTER(ctypes.c_float)
    lib.rotate_bilinear_f32(
        images.ctypes.data_as(fptr),
        out.ctypes.data_as(fptr),
        B, H, W,
        angles.ctypes.data_as(fptr),
    )
    return out
