"""Sparse NN building blocks (flax.linen).

TPU-native analog of the reference's Minkowski/torchsparse layer zoo
(reference: lib/minkowski_sparse_conv_layers.py:114-226 and
models/convolutional/lossl_coord/model.py:645-672). Sparse tensors are
(feats, neighbor_table) pairs; the table is built once per scale with
ops.build_neighbor_table and shared across every conv at that scale.
"""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse import sparse_conv_apply


class PReLU(nn.Module):
    """Single-parameter PReLU (torch nn.PReLU default)."""
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param('alpha', lambda key: jnp.full((1,), self.init, jnp.float32))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def torch_bias_init(fan_in: int):
    """torch Conv/Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    Nonzero bias matters: with a degenerate all-zero input (e.g. an untrained
    bottleneck rounding to 0) a zero-bias network is identically zero and
    downstream argmax/pruning logic sees all-ties."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class SparseConv3x3(nn.Module):
    """3^3 stride-1 sparse convolution over a precomputed neighbor table."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, feats: jax.Array, table: jax.Array) -> jax.Array:
        cin = feats.shape[-1]
        # He-uniform over fan_in = 27 * cin, matching torch Conv3d init scale.
        w = self.param('kernel', nn.initializers.variance_scaling(
            1 / 3, 'fan_in', 'uniform'), (27, cin, self.features), jnp.float32)
        b = self.param('bias', torch_bias_init(27 * cin), (self.features,),
                       jnp.float32) if self.use_bias else None
        return sparse_conv_apply(
            feats, table, w.astype(feats.dtype),
            None if b is None else b.astype(feats.dtype))


class ResBlock(nn.Module):
    """conv -> PReLU -> conv -> +residual -> PReLU
    (reference: lossl_coord/model.py:645-660)."""
    features: int

    @nn.compact
    def __call__(self, feats: jax.Array, table: jax.Array) -> jax.Array:
        x = SparseConv3x3(self.features)(feats, table)
        x = PReLU()(x)
        x = SparseConv3x3(self.features)(x, table)
        x = x + feats
        return PReLU()(x)


class StridedOctantConv(nn.Module):
    """Kernel-2^k stride-2^k conv as one GEMM over a dense [M, 8^k, Cin]
    ancestor-gathered tensor (see ops.ancestor_gather_dense). The TPU-native
    form of strided sparse convolutions: one MXU-shaped matmul instead of
    per-offset gather/scatter."""
    features: int
    levels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, dense: jax.Array) -> jax.Array:
        m, k3, cin = dense.shape
        w = self.param('kernel', nn.initializers.variance_scaling(
            1 / 3, 'fan_in', 'uniform'), (k3, cin, self.features), jnp.float32)
        out = jnp.einsum('mkc,kcf->mf', dense, w.astype(dense.dtype))
        if self.use_bias:
            b = self.param('bias', torch_bias_init(k3 * cin),
                           (self.features,), jnp.float32)
            out = out + b.astype(dense.dtype)
        return out


class OctantTransposeConv(nn.Module):
    """Generative transpose of StridedOctantConv (kernel-2 stride-2): every
    parent emits features for all 8 children in one GEMM -> [M, 8, Cout]
    (the reference's MinkowskiGenerativeConvolutionTranspose,
    lib/minkowski_sparse_conv_layers.py:146-160)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        m, cin = feats.shape
        w = self.param('kernel', nn.initializers.variance_scaling(
            1 / 3, 'fan_in', 'uniform'), (8, cin, self.features), jnp.float32)
        out = jnp.einsum('mc,kcf->mkf', feats, w.astype(feats.dtype))
        if self.use_bias:
            b = self.param('bias', torch_bias_init(cin), (self.features,),
                           jnp.float32)
            out = out + b.astype(feats.dtype)
        return out


class MLP(nn.Module):
    """Dense stack with PReLU between layers (pointwise ops on sparse feats)."""
    features: Sequence[int]
    final_act: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=x.dtype, param_dtype=jnp.float32)(x)
            if i < len(self.features) - 1 or self.final_act:
                x = PReLU()(x)
        return x
