"""Length masking utilities (reference: functional/mask.py:4-9)."""
import jax
import jax.numpy as jnp


def get_mask(length: jax.Array, max_len: int) -> jax.Array:
    """length: [B] int -> boolean mask [B, 1, max_len].

    Unlike the torch version, `max_len` must be static (XLA static shapes).
    """
    pos = jnp.arange(max_len)[None, None, :]
    return pos < length[:, None, None]
