"""DP training numerics: the N-device shard_map step must equal the
single-device step on the concatenated batch (reference semantics:
DDP gradient averaging + no_sync accumulation, reference train.py:139-217,
382-404)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fastpcc_tpu.parallel.mesh import (make_dp_train_step, make_mesh,
                                       shard_batch)

D, A, CAP = 8, 2, 64     # devices, grad-acc microbatches, rows per sample


def _loss_fn(params, codes, count, points_num, step):
    """Tiny but nonlinear per-sample loss over the valid code rows."""
    x = (codes[:, None] * jnp.arange(1, 5)[None, :]).astype(jnp.float32)
    x = x / (1.0 + jnp.abs(x))
    h = jnp.tanh(x @ params['w1'] + params['b1'])
    y = h @ params['w2']
    mask = (jnp.arange(codes.shape[0]) < count)[:, None]
    mse = jnp.sum(jnp.where(mask, y ** 2, 0.0)) / jnp.maximum(count, 1)
    loss = mse * (1.0 + 0.1 * step) / jnp.maximum(points_num[0], 1)
    return loss, {'mse': mse}


def _data(seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 1 << 20, size=(D, A, CAP), dtype=np.int64)
    counts = rng.integers(CAP // 2, CAP + 1, size=(D, A)).astype(np.int32)
    points_num = rng.integers(100, 200, size=(D, A, 1)).astype(np.int32)
    return codes, counts, points_num


def _init_params(key):
    k1, k2 = jax.random.split(key)
    return {
        'w1': jax.random.normal(k1, (4, 8), jnp.float32) * 0.3,
        'b1': jnp.zeros((8,), jnp.float32),
        'w2': jax.random.normal(k2, (8, 2), jnp.float32) * 0.3,
    }


@pytest.mark.skipif(jax.device_count() < D, reason=f'needs {D} devices')
def test_dp_step_matches_single_device():
    params = _init_params(jax.random.PRNGKey(0))
    opt = optax.adamw(1e-2)
    opt_state = opt.init(params)
    codes, counts, points_num = _data()

    # single-device reference: mean of the D*A per-sample grads, one step
    def batch_loss(p):
        losses = []
        for d in range(D):
            for a in range(A):
                l, _ = _loss_fn(p, jnp.asarray(codes[d, a]),
                                jnp.asarray(counts[d, a]),
                                jnp.asarray(points_num[d, a]),
                                jnp.float32(3.0))
                losses.append(l)
        return jnp.mean(jnp.stack(losses))

    loss_ref, grads_ref = jax.value_and_grad(batch_loss)(params)
    updates, os_ref = opt.update(grads_ref, opt.init(params), params)
    p_ref = jax.tree.map(np.asarray, optax.apply_updates(params, updates))
    keys = list(params)

    # the DP step donates params/opt_state — run it last
    mesh = make_mesh(D)
    dp_step = make_dp_train_step(_loss_fn, opt, mesh, grad_acc_steps=A)
    d_codes, d_counts, d_pn = shard_batch(mesh, codes, counts, points_num)
    p_dp, os_dp, loss_dp, aux_dp = dp_step(
        params, opt_state, d_codes, d_counts, d_pn, jnp.float32(3.0))

    assert np.allclose(float(loss_dp), float(loss_ref), rtol=1e-5)
    for k in keys:
        np.testing.assert_allclose(np.asarray(p_dp[k]), np.asarray(p_ref[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.skipif(jax.device_count() < D, reason=f'needs {D} devices')
def test_dp_step_replication_consistency():
    """Params stay replicated (identical on every device) after a step."""
    params = _init_params(jax.random.PRNGKey(1))
    opt = optax.sgd(1e-2)
    opt_state = opt.init(params)
    codes, counts, points_num = _data(seed=1)
    mesh = make_mesh(D)
    dp_step = make_dp_train_step(_loss_fn, opt, mesh, grad_acc_steps=A)
    d = shard_batch(mesh, codes, counts, points_num)
    p, _, _, _ = dp_step(params, opt_state, *d, jnp.float32(0.0))
    for k, v in p.items():
        per_dev = [np.asarray(s.data) for s in v.addressable_shards]
        for x in per_dev[1:]:
            np.testing.assert_array_equal(per_dev[0], x, err_msg=k)
