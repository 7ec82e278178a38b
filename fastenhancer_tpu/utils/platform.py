"""Honor an explicit JAX_PLATFORMS even when a site hook pre-registered a
different backend (this container's sitecustomize forces "axon,cpu")."""
from __future__ import annotations

import os


def honor_jax_platforms() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized; too late to change
