"""Evaluation: out-of-sample conditional generation, MSE, image panels.

Reference counterpart: callbacks.py + the out-of-sample eval inside
train_gppvae.py (SURVEY.md §2.1, §3.4).
"""

from gppvae_tpu.eval.panels import save_panel
from gppvae_tpu.eval.oos import oos_predict_images, predict_heldout
from gppvae_tpu.eval.serving import (
    ServerState,
    build_server_state,
    export_compiled_program,
    load_compiled_program,
    load_server_state,
    predict_images,
    sample_images,
    save_server_state,
    x_map_from_meta,
)

__all__ = [
    "save_panel",
    "oos_predict_images",
    "predict_heldout",
    "ServerState",
    "build_server_state",
    "export_compiled_program",
    "load_compiled_program",
    "load_server_state",
    "predict_images",
    "sample_images",
    "save_server_state",
    "x_map_from_meta",
]
