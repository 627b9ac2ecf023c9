"""KNN, Hilbert, kd-partition, PLY I/O, EMA, loose checkpoint tests."""
import numpy as np
import jax
import jax.numpy as jnp

from fastpcc_tpu.ops.knn import knn
from fastpcc_tpu.ops.hilbert import hilbert3d_encode
from fastpcc_tpu.data.kd_partition import (kd_tree_partition,
                                           kd_tree_partition_randomly)
from fastpcc_tpu.data.ply_io import write_ply, read_ply


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(50, 3)).astype(np.float32)
    r = rng.normal(size=(200, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(q), jnp.asarray(r), jnp.int32(200), k=3, tile=64)
    full = ((q[:, None] - r[None]) ** 2).sum(-1)
    exp_i = np.argsort(full, axis=1)[:, :3]
    exp_d = np.take_along_axis(full, exp_i, 1)
    np.testing.assert_allclose(np.asarray(d), exp_d, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(i), exp_i)


def test_knn_respects_ref_count():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(10, 3)).astype(np.float32)
    r = np.concatenate([rng.normal(size=(20, 3)),
                        np.zeros((30, 3))]).astype(np.float32)
    _, i = knn(jnp.asarray(q), jnp.asarray(r), jnp.int32(20), k=2, tile=16)
    assert (np.asarray(i) < 20).all()


def test_hilbert_is_permutation_and_local():
    bits = 4
    size = 1 << bits
    grid = np.stack(np.meshgrid(*[np.arange(size)] * 3, indexing='ij'),
                    axis=-1).reshape(-1, 3)
    codes = np.asarray(hilbert3d_encode(jnp.asarray(grid), bits=bits))
    # bijection over the full cube
    assert len(np.unique(codes)) == size ** 3
    assert codes.min() == 0 and codes.max() == size ** 3 - 1
    # locality: consecutive indexes are adjacent voxels (step distance 1)
    order = np.argsort(codes)
    steps = np.abs(np.diff(grid[order], axis=0)).sum(1)
    assert (steps == 1).all()


def test_kd_partition():
    rng = np.random.default_rng(2)
    xyz = rng.integers(0, 1000, (5000, 3))
    parts = kd_tree_partition(xyz, 600)
    assert all(len(p) <= 600 for p in parts)
    assert sum(len(p) for p in parts) == 5000
    total = np.concatenate(parts)
    a = total[np.lexsort(total.T[::-1])]
    b = xyz[np.lexsort(xyz.T[::-1])]
    np.testing.assert_array_equal(a, b)

    crop = kd_tree_partition_randomly(xyz, 600, rng)
    assert len(crop) <= 600


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (100, 3)).astype(np.uint8)
    path = str(tmp_path / 'test.ply')
    write_ply(path, xyz, rgb=rgb)
    data = read_ply(path)
    np.testing.assert_allclose(data['xyz'], xyz, rtol=1e-6)
    np.testing.assert_array_equal(data['rgb'], rgb)


def test_ema_warmup_schedule():
    from fastpcc_tpu.utils.ema import ema_decay, ema_update
    d0 = float(ema_decay(1, 0.9999, use_warmup=True))
    d_mid = float(ema_decay(1000, 0.9999, use_warmup=True, warmup_power=0.75))
    d_late = float(ema_decay(10 ** 6, 0.9999, use_warmup=True))
    assert d0 == 0.0
    assert 0 < d_mid < 0.9999
    assert abs(d_late - 0.9999) < 1e-9
    p = {'w': jnp.ones((3,))}
    e = {'w': jnp.zeros((3,))}
    out = ema_update(e, p, 0.9)
    np.testing.assert_allclose(np.asarray(out['w']), 0.1)


def test_loose_checkpoint_loading():
    from fastpcc_tpu.utils.checkpoint import load_loose_params
    target = {'a': {'w': np.zeros((4, 4)), 'b': np.zeros((2,))}}
    loaded = {'a': {'w': np.ones((3, 5)), 'extra': np.ones(1)}}
    out, warnings = load_loose_params(target, loaded)
    assert out['a']['w'][:3, :4].sum() == 12  # overlapping slice copied
    assert out['a']['w'][3].sum() == 0
    assert any('missing' in w for w in warnings)
    assert any('unexpected' in w for w in warnings)
