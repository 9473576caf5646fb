"""Training state pytree.

One immutable struct carries everything the reference spreads across Chainer
links, optimizers and the trainer: generator/discriminator params, the
per-clipping-domain optax states (``map`` is None for DCGAN), the EMA
("smoothed generator") params, the discriminator's spectral-norm power
iteration state, and the iteration counter. Checkpointing serialises exactly
this struct (+ RNG key) — SURVEY §5.4.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct


@flax.struct.dataclass
class TrainState:
    params_gen: Any
    params_dis: Any
    opt_map: Optional[Any]  # stylegan/deepvoxels mapping optimizer state
    opt_gen: Any
    opt_dis: Any
    ema_gen: Optional[Any]  # smoothed-generator params (None if disabled)
    sn_state: Optional[Any]  # discriminator 'sn' collection (None unless sn)
    iteration: Any  # int32 scalar
    gen_state: Optional[Any] = None  # generator 'batch_stats' (deepvoxels only)
