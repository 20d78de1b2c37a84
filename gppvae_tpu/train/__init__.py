"""Training drivers: vanilla VAE pretrain and GPPVAE (dis/joint).

Reference counterparts: pysrc/faceplace/train_vae.py, train_gppvae.py and the
fork's rotated-MNIST drivers (SURVEY.md §2.1, §3.1–3.2). Each driver is a
pure-JAX scan-per-epoch loop over an HBM-resident dataset: the host touches
the device once per epoch (permutation upload + metric readback), not once
per minibatch.
"""

from gppvae_tpu.train.losses import gaussian_recon_nll, kl_standard_normal, neg_entropy
from gppvae_tpu.train.train_cvae import CVAETrainConfig, train_cvae
from gppvae_tpu.train.train_vae import VAETrainConfig, train_vae
from gppvae_tpu.train.train_gppvae import GPPVAETrainConfig, train_gppvae

__all__ = [
    "gaussian_recon_nll",
    "kl_standard_normal",
    "neg_entropy",
    "CVAETrainConfig",
    "train_cvae",
    "VAETrainConfig",
    "train_vae",
    "GPPVAETrainConfig",
    "train_gppvae",
]
