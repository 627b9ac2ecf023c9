"""EMA of the params pytree with warmup decay schedule.

Functional analog of the reference's timm ModelEmaV3 wrapper
(reference: lib/model_ema.py:12-139): decay warmup
``1 - (1 + step/gamma)^-power`` capped at ``decay``; one fused jit update.
"""
import functools

import jax
import jax.numpy as jnp


def ema_decay(step, decay: float = 0.9999, use_warmup: bool = False,
              warmup_gamma: float = 1.0, warmup_power: float = 2 / 3,
              min_decay: float = 0.0):
    step = jnp.maximum(step - 1, 0)
    if not use_warmup:
        return jnp.where(step <= 0, 0.0, decay)
    d = 1.0 - (1.0 + step / warmup_gamma) ** -warmup_power
    d = jnp.clip(d, min_decay, decay)
    return jnp.where(step <= 0, 0.0, d)


@functools.partial(jax.jit, donate_argnums=(0,))
def ema_update(ema_params, params, decay):
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)
