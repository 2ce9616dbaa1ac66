"""Per-parameter-group Adam for the GaussianScene, with state surgery.

TPU-native replacement for the reference's per-group torch.optim.Adam plus
optimizer-state surgery (``/root/reference/scene/gaussian_model.py:149-167,
258-327``): the state is a pytree of (mu, nu) arrays shaped like the scene's
learnable leaves plus a per-leaf step counter, so densify/prune becomes masked
scatter edits (zero the slots of new points — the reference zeroes exp_avg for
appended tensors at :315-316) instead of tensor concatenation.

Learning rates: every leaf has a fixed lr except ``xyz`` whose lr follows the
Plenoxels-style exponential schedule (``utils/general_utils.py:46-62``,
``gaussian_model.py:169-175``); pass the current xyz lr into ``step``.
Adam eps matches the reference's 1e-15 (``gaussian_model.py:164``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

# The learnable leaves of GaussianScene, in a fixed order.
PARAM_LEAVES = ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")


@struct.dataclass
class AdamState:
    mu: Dict[str, jnp.ndarray]
    nu: Dict[str, jnp.ndarray]
    counts: Dict[str, jnp.ndarray]  # per-leaf step counters (float32 scalars)

    @staticmethod
    def init(scene) -> "AdamState":
        params = {k: getattr(scene, k) for k in PARAM_LEAVES}
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(
            mu=zeros,
            nu=jax.tree.map(jnp.zeros_like, params),
            counts={k: jnp.zeros((), jnp.float32) for k in PARAM_LEAVES},
        )


def leaf_learning_rates(opt, xyz_lr) -> Dict[str, jnp.ndarray]:
    """Per-leaf lrs from an OptimizationParams-like object
    (gaussian_model.py:152-160: features_rest uses feature_lr/20)."""
    return {
        "xyz": xyz_lr,
        "features_dc": opt.feature_lr,
        "features_rest": opt.feature_lr / 20.0,
        "scaling": opt.scaling_lr,
        "rotation": opt.rotation_lr,
        "opacity": opt.opacity_lr,
    }


def adam_step(
    scene,
    grads: Dict[str, jnp.ndarray],
    state: AdamState,
    lrs: Dict[str, jnp.ndarray],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam update on the scene's learnable leaves. Dead slots still carry
    (zero) gradients — their params stay frozen since mu/nu stay zero there
    only if grads are zero, which the render path guarantees (dead slots never
    contribute to the image)."""
    new_params, new_mu, new_nu, new_counts = {}, {}, {}, {}
    for k in PARAM_LEAVES:
        g = grads[k]
        t = state.counts[k] + 1.0
        mu = b1 * state.mu[k] + (1 - b1) * g
        nu = b2 * state.nu[k] + (1 - b2) * (g * g)
        mu_hat = mu / (1 - b1**t)
        nu_hat = nu / (1 - b2**t)
        new_params[k] = getattr(scene, k) - lrs[k] * mu_hat / (jnp.sqrt(nu_hat) + eps)
        new_mu[k], new_nu[k], new_counts[k] = mu, nu, t
    scene = scene.replace(**new_params)
    state = AdamState(mu=new_mu, nu=new_nu, counts=new_counts)
    return scene, state


def zero_state_slots(state: AdamState, slot_mask: jnp.ndarray) -> AdamState:
    """Zero mu/nu at the given capacity slots on every leaf (the reference's
    treatment of newly appended points, gaussian_model.py:315-316)."""

    def zero(arr):
        m = slot_mask.reshape((-1,) + (1,) * (arr.ndim - 1))
        return jnp.where(m, 0.0, arr)

    return AdamState(
        mu={k: zero(v) for k, v in state.mu.items()},
        nu={k: zero(v) for k, v in state.nu.items()},
        counts=state.counts,
    )


def zero_state_leaf(state: AdamState, leaf: str) -> AdamState:
    """Reset one leaf's state entirely (the reference's replace_tensor_to_optimizer
    on opacity reset, gaussian_model.py:210-213, 258-271)."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[leaf] = jnp.zeros_like(mu[leaf])
    nu[leaf] = jnp.zeros_like(nu[leaf])
    return AdamState(mu=mu, nu=nu, counts=state.counts)


def compact_state(state: AdamState, alive: "jnp.ndarray", capacity: int) -> AdamState:
    """Host-side repack of the optimizer state matching GaussianScene.compact:
    alive slots move to the front, freed/new slots get zero state (preserves
    momentum across capacity growth, unlike a reinit)."""
    import numpy as np

    idx = np.nonzero(np.asarray(alive))[0]
    n = len(idx)

    def pack(arr):
        arr = np.asarray(arr)
        out = np.zeros((capacity,) + arr.shape[1:], arr.dtype)
        out[:n] = arr[idx]
        return jnp.asarray(out)

    return AdamState(
        mu={k: pack(v) for k, v in state.mu.items()},
        nu={k: pack(v) for k, v in state.nu.items()},
        counts=state.counts,
    )


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1000000):
    """Plenoxels exponential lr schedule (utils/general_utils.py:46-62),
    jnp-traced so it can live inside the jitted train step."""
    step = jnp.asarray(step, jnp.float32)
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    zero = jnp.where((step < 0) | ((lr_init == 0.0) & (lr_final == 0.0)), 0.0, 1.0)
    return zero * delay_rate * log_lerp
