"""General helpers: activations inverses, LR schedules, seeding, stdout stamping.

Parity: ``/root/reference/utils/general_utils.py`` (inverse_sigmoid, PILtoTorch
counterpart, Plenoxels exponential LR schedule, safe_state).
"""

from __future__ import annotations

import random
import sys
from datetime import datetime

import numpy as np
import jax.numpy as jnp


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def pil_to_array(pil_image, resolution):
    """PIL image -> float32 CHW array in [0,1] (reference PILtoTorch,
    general_utils.py:21-28)."""
    resized = pil_image.resize(resolution)
    arr = np.asarray(resized, dtype=np.float32) / 255.0
    if arr.ndim == 3:
        return np.transpose(arr, (2, 0, 1))
    return arr[None, ...]


def get_expon_lr_func(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1000000):
    """Log-linearly interpolated (exponential) LR decay with optional sine warm
    delay. Same semantics as the Plenoxels schedule the reference uses for xyz
    (general_utils.py:30-62). Works on python ints and traced jnp steps."""

    def helper(step):
        if lr_init == 0.0 and lr_final == 0.0:
            return 0.0
        step = jnp.asarray(step, dtype=jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        return jnp.where(step < 0, 0.0, delay_rate * log_lerp)

    return helper


def safe_state(silent: bool, seed: int = 0):
    """Timestamp every stdout line and seed host RNGs (reference
    general_utils.py:112-133). JAX device RNG keys are explicit; trainers derive
    them from the same seed."""
    old_f = sys.stdout

    class _F:
        def __init__(self, silent):
            self.silent = silent

        def write(self, x):
            if not self.silent:
                if x.endswith("\n"):
                    old_f.write(x.replace("\n", " [{}]\n".format(datetime.now().strftime("%d/%m %H:%M:%S"))))
                else:
                    old_f.write(x)

        def flush(self):
            old_f.flush()

    sys.stdout = _F(silent)
    random.seed(seed)
    np.random.seed(seed)
    return seed
