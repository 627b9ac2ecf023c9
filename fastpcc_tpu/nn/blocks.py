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


class PDense(nn.Module):
    """Dense layer computing in the INPUT dtype (param storage f32).

    flax's nn.Dense with default dtype promotes bf16 activations to f32
    (params are f32), which makes every pointwise layer in the per-scale
    chains materialize f32 [N, 8*ch] intermediates in HBM — the dominant
    cost of the flagship's full-resolution scales (PERFNOTES.md round 3).
    Param tree matches nn.Dense ('kernel' [in, out], 'bias')."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (cin, self.features), jnp.float32)
        y = jax.lax.dot(x, k.astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b.astype(x.dtype)
        return y


class SplitDense(nn.Module):
    """Dense over a logical concatenation [a, b] WITHOUT materializing the
    concat: y = a @ K[:ca] + b @ K[ca:] + bias. Param tree identical to a
    Dense over the concatenated input (kernel [ca+cb, out])."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        ca, cb = a.shape[-1], b.shape[-1]
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (ca + cb, self.features), jnp.float32)
        kd = k.astype(a.dtype)
        y = jax.lax.dot(a, kd[:ca], preferred_element_type=jnp.float32)
        y = y + jax.lax.dot(b.astype(a.dtype), kd[ca:],
                            preferred_element_type=jnp.float32)
        y = y.astype(a.dtype)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(a.dtype)
        return y


class OctantSelectDense(nn.Module):
    """Fused (Dense ch -> 8*ch at parents) + (select occupied children).

    The unfused form writes an [N_parent, 8*ch] tensor to HBM and row-gathers
    occupied children out of it. Here each child row gathers its parent's
    ch-wide features once and applies the octant-specific kernel column block
    via 8 masked GEMMs — HBM traffic drops from (8*ch parent write + ch child
    read) to (ch child gather + ch child write). Param tree identical to the
    unfused Dense (kernel [ch, 8*ch], bias [8*ch])."""
    features: int        # per-child output channels (ch); kernel emits 8*ch

    @nn.compact
    def __call__(self, parent_feats: jax.Array, parent_of_child: jax.Array,
                 octant_of_child: jax.Array) -> jax.Array:
        cin = parent_feats.shape[-1]
        ch = self.features
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (cin, ch * 8), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (ch * 8,),
                          jnp.float32)
        n = parent_feats.shape[0]
        padded = jnp.concatenate(
            [parent_feats, jnp.zeros_like(parent_feats[:1])], axis=0)
        g = padded[jnp.minimum(parent_of_child, n)]          # [N_child, cin]
        # Fast eval programs (fast_conv_scope truthy) take the fused Pallas
        # kernel: the [N, 8ch] product and the octant select stay in VMEM
        # (the XLA where-chain below moves ~8 x [N, ch] through HBM —
        # round-5 fusion-tail attribution). No VJP -> eval only.
        from ..ops import sparse as _sp
        nc = g.shape[0]
        if (_sp.current_fast() and g.dtype == jnp.bfloat16
                and nc % 256 == 0 and cin % 128 == 0 and ch % 128 == 0):
            from ..ops.pallas_select import octant_select_dense
            return octant_select_dense(g, octant_of_child, k, bias,
                                       interpret=_sp._pallas_interpret())
        kd = k.astype(g.dtype)
        bd = bias.astype(g.dtype)
        out = None
        for o in range(8):
            y = jax.lax.dot(g, kd[:, o * ch:(o + 1) * ch],
                            preferred_element_type=jnp.float32).astype(g.dtype)
            y = y + bd[o * ch:(o + 1) * ch]
            m = (octant_of_child == o)[:, None]
            out = jnp.where(m, y, 0.0 if out is None else out)
        return out


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
