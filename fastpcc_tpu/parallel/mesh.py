"""Data-parallel training over a jax.sharding.Mesh.

TPU-native replacement for the reference's DDP/NCCL layer
(reference: train.py:139-217 and SURVEY §2.9): single-program shard_map over
an ICI 'dp' axis, per-device loss on its batch shard, gradient pmean, and a
replicated optimizer step — no process groups, no parameter broadcast
(params are replicated by the sharding, and non-tensor coder state never
enters the pytree, the analog of the reference's _extra_state ignore list).
"""
import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_mesh(n_devices: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ('dp',))


def shard_batch(mesh: Mesh, *arrays):
    """Place leading-axis-sharded arrays on the mesh (leading axis = device)."""
    sharding = jax.sharding.NamedSharding(mesh, P('dp'))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def make_dp_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                       mesh: Mesh) -> Callable:
    """Build a jitted DP train step.

    loss_fn(params, codes, count, points_num) -> (loss, aux_dict).
    The step takes per-device-stacked batch arrays with leading dim =
    mesh size: codes [D, cap], counts [D], points_num [D, B_local].
    """

    def local_step(params, opt_state, codes, counts, points_num):
        # inside shard_map: leading dim is this device's shard (size 1)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, codes[0], counts[0], points_num[0])
        grads = jax.lax.pmean(grads, 'dp')
        loss = jax.lax.pmean(loss, 'dp')
        aux = jax.tree.map(lambda x: jax.lax.pmean(x, 'dp'), aux)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P('dp'), P('dp'), P('dp')),
        out_specs=(P(), P(), P(), P()),
        check_rep=False)
    return jax.jit(sharded, donate_argnums=(0, 1))
