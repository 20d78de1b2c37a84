"""Per-epoch PNG image panels (reference: callbacks.py, SURVEY.md §2.1).

Rows of images (e.g. input / reconstruction / out-of-sample prediction)
written as one PNG grid for eyeball parity with the reference's panels.
"""

from __future__ import annotations

import os

import numpy as np


def save_panel(path: str, rows: list[np.ndarray], *, pad: int = 2) -> None:
    """rows: list of (B, H, W, C) arrays in [0,1]; one grid row each."""
    from PIL import Image

    rows = [np.asarray(r) for r in rows]
    B = min(r.shape[0] for r in rows)
    H, W, C = rows[0].shape[1:]
    grid = np.ones(
        (len(rows) * (H + pad) + pad, B * (W + pad) + pad, 3 if C == 3 else 1),
        dtype=np.float32,
    )
    for i, row in enumerate(rows):
        for j in range(B):
            img = np.clip(row[j], 0.0, 1.0)
            y0 = pad + i * (H + pad)
            x0 = pad + j * (W + pad)
            grid[y0 : y0 + H, x0 : x0 + W] = img
    arr = (grid * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(arr).save(path)
