"""Color-specific layers for lossy_coord_lossy_color (reference:
models/convolutional/lossy_coord_lossy_color/layers.py:28-333)."""
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import SparseConv3x3, OctantTransposeConv
from ...ops.knn import knn
from ..lossy_coord_v2.network import ActM, ConvA, DownA, MLPA

# BT.709 RGB->YUV (reference: lib/metrics/misc.py:17-34), applied on 0..255
_BT709 = np.array([[0.2126, 0.7152, 0.0722],
                   [-0.1146, -0.3854, 0.5],
                   [0.5, -0.4542, -0.0458]], np.float32)
_BT709_BIAS = np.array([0.0, 128.0, 128.0], np.float32)


def rgb_to_yuv709(rgb255: jax.Array) -> jax.Array:
    return rgb255 @ jnp.asarray(_BT709).T + jnp.asarray(_BT709_BIAS)


class ColorEncStage(nn.Module):
    """Downsample stage: stride-2 conv + 3^3 conv (reference:
    layers.py:49-60); the last stage's conv outputs geo_lossl_channels[0]."""
    features: int
    out_features: int
    act: str

    @nn.compact
    def __call__(self, dense, parent_table):
        x = DownA(self.features, self.act)(dense)
        return ConvA(self.out_features, self.act)(x, parent_table)


class ColorDecStage(nn.Module):
    """Upsample stage + occupancy classifier (reference: layers.py:91-103)."""
    features: int
    act: str

    def setup(self):
        self.up = OctantTransposeConv(self.features)
        self.up_act = ActM(self.act)
        self.post = ConvA(self.features, self.act)
        self.cls1 = ConvA(self.features, self.act)
        self.cls2 = SparseConv3x3(1)

    def child_dense(self, feats):
        return self.up_act(self.up(feats))

    def refine(self, cand_feats, cand_table):
        x = self.post(cand_feats, cand_table)
        logits = self.cls2(self.cls1(x, cand_table),
                           cand_table).astype(jnp.float32)[:, 0]
        return x, logits


class ColorHead(nn.Module):
    """predict_block: [fea, keep-flag x2] -> RGB (reference:
    layers.py:104-118 + inverse_transform_for_color :237-239)."""
    features: int
    act: str

    @nn.compact
    def __call__(self, feats_with_keep, table, training: bool):
        half = max(self.features // 2, 1)
        x = ConvA(half, self.act)(feats_with_keep, table)
        x = ConvA(half, self.act)(x, table)
        x = SparseConv3x3(3)(x, table).astype(jnp.float32)
        if training:
            return x * 255.0
        return jnp.clip(x, 0.0, 1.0) * 255.0


def sample_wise_recolor(pred_xyz: jax.Array, pred_count,
                        tgt_xyz: jax.Array, tgt_count, tgt_rgb: jax.Array,
                        k: int = 8) -> jax.Array:
    """Ground-truth color transfer onto predicted coords (reference:
    lossy_coord_lossy_color/layers.py:269-333): backward pass scatters each
    target's color to its nearest predictions with inverse-distance weights
    (exact matches copy directly); predictions left empty take the mean color
    of their nearest targets (forward pass). Static shapes: padded rows are
    masked by counts."""
    m = pred_xyz.shape[0]
    nt = tgt_xyz.shape[0]
    valid_t = (jnp.arange(nt) < tgt_count)[:, None]

    # backward: tgt -> k nearest preds
    d, idx = knn(tgt_xyz, pred_xyz, pred_count, k=k)         # [Nt, k]
    zero = d <= 0.0
    has_zero = zero.any(1, keepdims=True)
    nearest = (d == d.min(1, keepdims=True)) & ~has_zero & valid_t
    w = jnp.where(nearest, 1.0 / jnp.sqrt(jnp.maximum(d, 1e-12)), 0.0)
    idx_c = jnp.minimum(idx, m)                               # m = drop row
    num = jnp.zeros((m + 1, 3), jnp.float32).at[idx_c].add(
        tgt_rgb[:, None, :] * w[..., None], mode='drop')[:m]
    den = jnp.zeros((m + 1,), jnp.float32).at[idx_c].add(w, mode='drop')[:m]
    recolored = num / jnp.maximum(den, 1e-12)[:, None]
    filled = den > 0
    # exact matches override (scatter the matching target's rgb)
    zmask = zero & valid_t
    zidx = jnp.where(zmask, idx_c, m)
    exact = jnp.full((m + 1, 3), -1.0).at[zidx].set(
        jnp.broadcast_to(tgt_rgb[:, None, :], zmask.shape + (3,)),
        mode='drop')[:m]
    is_exact = exact[:, 0] >= 0
    recolored = jnp.where(is_exact[:, None], exact, recolored)
    filled = filled | is_exact

    # forward fill for empty predictions: mean color of nearest targets
    d2, idx2 = knn(pred_xyz, tgt_xyz, tgt_count, k=k)         # [M, k]
    near2 = (d2 == d2.min(1, keepdims=True)).astype(jnp.float32)
    rgb2 = jnp.concatenate([tgt_rgb, jnp.zeros((1, 3), tgt_rgb.dtype)], 0)
    fwd = (rgb2[jnp.minimum(idx2, nt)] * near2[..., None]).sum(1) \
        / jnp.maximum(near2.sum(1), 1.0)[:, None]
    return jnp.where(filled[:, None], recolored, fwd)
