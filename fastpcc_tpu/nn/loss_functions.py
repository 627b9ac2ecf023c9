"""Chamfer distance loss (reference: lib/loss_functions.py:7-41; legacy —
not used by the current model zoo, kept for capability parity)."""
import jax
import jax.numpy as jnp

from ..ops.knn import knn


def chamfer_loss(pred: jax.Array, target: jax.Array, pred_count,
                 target_count) -> jax.Array:
    """Symmetric mean squared nearest-neighbor distance between two padded
    point sets [N, 3] / [M, 3]."""
    d_pt, _ = knn(pred, target, target_count, k=1)
    d_tp, _ = knn(target, pred, pred_count, k=1)
    n = pred.shape[0]
    m = target.shape[0]
    mask_p = (jnp.arange(n) < pred_count).astype(pred.dtype)
    mask_t = (jnp.arange(m) < target_count).astype(target.dtype)
    loss_p = (d_pt[:, 0] * mask_p).sum() / jnp.maximum(pred_count, 1)
    loss_t = (d_tp[:, 0] * mask_t).sum() / jnp.maximum(target_count, 1)
    return loss_p + loss_t
