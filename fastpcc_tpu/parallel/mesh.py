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
                       mesh: Mesh, grad_acc_steps: int = 1,
                       with_feats: bool = False) -> Callable:
    """Build a jitted DP train step with optional gradient accumulation.

    loss_fn(params, codes, count, points_num, step) -> (loss, aux_dict), or
    with_feats=True: loss_fn(params, codes, count, feats, points_num, step)
    (per-point features such as RGB ride a [D, A, cap, C] array — the color
    model's training path). The step takes per-device, per-microbatch stacked
    arrays: codes [D, A, cap], counts [D, A], points_num [D, A, B_local], and
    a scalar training step. Gradients are averaged over the A microbatches
    (lax.scan, the analog of the reference's no_sync accumulation,
    reference: train.py:382-404) and pmean'd over the 'dp' axis.
    """

    def local_step(params, opt_state, codes, counts, points_num, step,
                   feats=None):
        codes, counts, points_num = codes[0], counts[0], points_num[0]
        if feats is not None:
            feats = feats[0]

        def micro(carry, xs):
            g_acc, l_acc = carry
            if with_feats:
                c, n, f, pn = xs
                (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, c, n, f, pn, step)
            else:
                c, n, pn = xs
                (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, c, n, pn, step)
            return (jax.tree.map(jnp.add, g_acc, g), l_acc + loss), aux

        g0 = jax.tree.map(jnp.zeros_like, params)
        xs = (codes, counts, feats, points_num) if with_feats \
            else (codes, counts, points_num)
        (grads, loss_sum), auxs = jax.lax.scan(micro, (g0, 0.0), xs)
        inv = 1.0 / grad_acc_steps
        grads = jax.tree.map(lambda g: g * inv, grads)
        loss = loss_sum * inv
        aux = jax.tree.map(lambda x: x[-1], auxs)

        grads = jax.lax.pmean(grads, 'dp')
        loss = jax.lax.pmean(loss, 'dp')
        aux = jax.tree.map(lambda x: jax.lax.pmean(x, 'dp'), aux)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    in_specs = [P(), P(), P('dp'), P('dp'), P('dp'), P()]
    if with_feats:
        in_specs.append(P('dp'))
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P(), P(), P()),
        check_rep=False)
    return jax.jit(sharded, donate_argnums=(0, 1))
