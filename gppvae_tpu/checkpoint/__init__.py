"""Checkpoint/resume via Orbax (SURVEY.md §5: checkpoint/resume).

The reference torch.saves VAE (and GP) weights each epoch and resumes GPPVAE
from `--vae_weights`; here the full train-state pytree (params, optimizer
states, epoch counter) checkpoints through Orbax, and the cross-script
`--vae_weights` handoff is preserved as a params-subtree save/load.
"""

from gppvae_tpu.checkpoint.orbax_io import (
    load_pytree,
    save_pytree,
    load_vae_weights,
    save_vae_weights,
)

__all__ = ["load_pytree", "save_pytree", "load_vae_weights", "save_vae_weights"]
