"""Data layer: rotated-digits builder, FacePlace loader, split logic.

Reference counterpart: pysrc/faceplace/data_parser.py + the fork's
rotated-MNIST builder (SURVEY.md §2.1, §3.5). All builders return the same
`GridDataset` contract: a grid-complete (object × view) image tensor with
integer object/view ids and a held-out mask for out-of-sample evaluation, so
every trainer and the GP layer are dataset-agnostic.
"""

from gppvae_tpu.data.dataset import GridDataset
from gppvae_tpu.data.rotated_digits import build_rotated_digits
from gppvae_tpu.data.faceplace import build_faceplace

__all__ = ["GridDataset", "build_rotated_digits", "build_faceplace"]
