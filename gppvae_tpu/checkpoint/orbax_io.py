"""Thin Orbax wrappers: whole-train-state and VAE-weights-only checkpoints."""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_pytree(path: str, tree) -> None:
    """Save any pytree of arrays (train state, params, …) to `path`."""
    path = _abs(path)
    tree = jax.tree.map(lambda x: jax.device_get(x), tree)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_pytree(path: str, abstract_tree=None):
    """Restore a pytree saved by save_pytree; `abstract_tree` (a matching
    pytree of arrays/ShapeDtypeStructs) pins structure and dtypes."""
    path = _abs(path)
    with ocp.StandardCheckpointer() as ckptr:
        if abstract_tree is not None:
            abstract_tree = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "shape")
                else x,
                abstract_tree,
            )
            return ckptr.restore(path, abstract_tree)
        return ckptr.restore(path)


def save_vae_weights(path: str, vae_params) -> None:
    """The --vae_weights handoff artifact: encoder+decoder params only."""
    save_pytree(path, {"vae_params": vae_params})


def load_vae_weights(path: str, abstract_params=None):
    tree = load_pytree(
        path,
        {"vae_params": abstract_params} if abstract_params is not None else None,
    )
    return tree["vae_params"]
