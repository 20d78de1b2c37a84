"""Map the reference-style --data flag onto dataset builders.

Accepted values (SURVEY.md §5 config table; BASELINE.json:7-11 configs):
    synthetic | sklearn | mnist:<dir>   → rotated-digits grid
    faces | faces:h5:<path>             → face-view grid (FacePlace-style)
    npz:<path>                          → any saved GridDataset
"""

from __future__ import annotations

from gppvae_tpu.data import GridDataset, build_faceplace, build_rotated_digits


def build_dataset_from_flag(
    flag: str, num_objects: int, num_views: int, seed: int
) -> GridDataset:
    if flag.startswith("npz:"):
        return GridDataset.load_npz(flag[4:])
    if flag == "faces":
        return build_faceplace(
            "synthetic", num_people=num_objects, num_poses=num_views, seed=seed
        )
    if flag.startswith("faces:"):
        return build_faceplace(flag.split(":", 1)[1], seed=seed)
    return build_rotated_digits(
        flag, num_objects=num_objects, num_views=num_views, seed=seed
    )
