"""Camera-parameter prior: paired 6-DoF samples with bounded pose difference.

Reference semantics (``train_rgbd.py:192-217``): a batch of ``B`` poses is
drawn as ``B/2`` *pairs* — the first half ``theta1 ~ U(-1,1)^6`` and the
second half ``theta2 = theta1 - eps * sign(theta1)`` with
``eps ~ U(0, 0.5)`` whose rotation components are scaled by
``clip(1/(range+1e-8), 0, 1)`` (limits the angular difference between the two
views) and optionally signed (uniform mode wraps theta2 back into [-1, 1]).
Both halves are finally scaled by the per-axis parameter range.

Two samplers are provided: a numpy twin (bit-exact reference semantics, for
host-side use and fixed-seed tests) and an on-device ``jax.random`` sampler
used inside the jitted train step so pose sampling never leaves HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PI_REF = 3.1415  # the reference compares ranges against this literal


class CameraParamPrior:
    def __init__(self, config):
        self.rotation_range = np.array(
            [config.x_rotate, config.y_rotate, config.z_rotate], dtype="float64"
        )
        self.camera_param_range = np.array(
            [
                config.x_rotate,
                config.y_rotate,
                config.z_rotate,
                config.x_translate,
                config.y_translate,
                config.z_translate,
            ],
            dtype="float64",
        )
        self.uniform = bool(config.uniform_distribution)

    # -- host-side twin (identical arithmetic to the reference) --------------

    def sample_np(self, batch_size: int) -> np.ndarray:
        thetas = np.random.uniform(-1, 1, size=(batch_size // 2, 6))
        eps = np.random.uniform(0, 0.5, size=(batch_size // 2, 6))
        sign = np.random.choice(2, size=(batch_size // 2, 3)) * 2 - 1
        eps = self._scale_eps_np(eps, sign)
        thetas2 = -eps * np.sign(thetas) + thetas
        if self.uniform:
            thetas2 = (
                thetas2 * (-1 <= thetas2) * (thetas2 <= 1)
                + (-2 - thetas2) * (thetas2 < -1)
                + (2 - thetas2) * (thetas2 > 1)
            )
        thetas = np.concatenate([thetas, thetas2], axis=0)
        thetas = thetas * self.camera_param_range[None]
        return thetas.astype("float32")

    def _scale_eps_np(self, eps: np.ndarray, sign: np.ndarray) -> np.ndarray:
        limit = np.clip(1 / (self.rotation_range + 1e-8), 0, 1)
        if self.uniform:
            eps[:, :3] = eps[:, :3] * sign * limit
        else:
            # full-circle axes (range == pi literal) keep the random sign;
            # bounded axes always step toward zero (|sign| == 1)
            full = self.rotation_range == PI_REF
            eps[:, :3] = eps[:, :3] * (sign * full + np.abs(sign) * (~full)) * limit
        return eps

    # -- on-device sampler ----------------------------------------------------

    def sample(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        """jit-able pair sampler; same distribution as :meth:`sample_np`."""
        k1, k2, k3 = jax.random.split(key, 3)
        half = batch_size // 2
        thetas = jax.random.uniform(k1, (half, 6), minval=-1.0, maxval=1.0)
        eps = jax.random.uniform(k2, (half, 6), minval=0.0, maxval=0.5)
        sign = jax.random.randint(k3, (half, 3), 0, 2) * 2 - 1

        rot_range = jnp.asarray(self.rotation_range, dtype=jnp.float32)
        limit = jnp.clip(1.0 / (rot_range + 1e-8), 0.0, 1.0)
        if self.uniform:
            eps_rot = eps[:, :3] * sign * limit
        else:
            full = (rot_range == PI_REF).astype(jnp.float32)
            eps_rot = eps[:, :3] * (sign * full + jnp.abs(sign) * (1.0 - full)) * limit
        eps = jnp.concatenate([eps_rot, eps[:, 3:]], axis=1)

        thetas2 = -eps * jnp.sign(thetas) + thetas
        if self.uniform:
            thetas2 = (
                thetas2 * ((-1 <= thetas2) & (thetas2 <= 1))
                + (-2 - thetas2) * (thetas2 < -1)
                + (2 - thetas2) * (thetas2 > 1)
            )
        thetas = jnp.concatenate([thetas, thetas2], axis=0)
        return thetas * jnp.asarray(self.camera_param_range, dtype=jnp.float32)[None]
