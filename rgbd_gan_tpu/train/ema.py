"""Exponential moving average of generator parameters.

Twin of ``common/utils/copy_param.py:17-40``: the smoothed generator tracks
``target = (1 - tau) * target + tau * source`` with ``tau = 1 - smoothing``
after every generator update (``updater.py:398-400``). As a pytree lerp this
also covers what the reference handles specially for BatchNorm statistics —
pass the full variables tree.
"""

from __future__ import annotations

import jax


def soft_copy_params(target, source, tau: float):
    """``target*(1-tau) + tau*source`` over a parameter pytree."""
    return jax.tree_util.tree_map(lambda t, s: t * (1.0 - tau) + tau * s, target, source)


def copy_params(source):
    """Hard copy (``copy_param.py:3-15``). A *real* buffer copy: aliased
    trees break buffer donation (donating the same buffer twice)."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, source)
