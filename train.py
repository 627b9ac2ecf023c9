"""Training entry: ``python train.py <config.yaml> a.b=c ...``

Same CLI contract as the reference harness (reference: train.py:35-129,
README.md:72-103). TPU-native internals: one jitted DP train step over a
jax.sharding.Mesh (shard_map + pmean) instead of DDP/NCCL, optax
multi-group optimizers driven by the model's params_divider, EMA pytree,
pickle checkpoints with the reference's resume-items semantics.
"""
import importlib
import math
import os
import os.path as osp
import sys
import time
from typing import List

import numpy as np

from fastpcc_tpu.config import Config
from fastpcc_tpu.utils import (autoindex_obj, make_new_dirs, Timer,
                               eta_by_seconds)
from fastpcc_tpu.utils.logging_utils import make_logger
from fastpcc_tpu.utils.checkpoint import (save_checkpoint, load_checkpoint,
                                          load_loose_params)
from fastpcc_tpu.utils.ema import ema_decay, ema_update


def build_optimizer(cfg_train, params_divider, steps_per_epoch: int):
    """Per-param-group optimizer stack (reference: train.py:265-317).

    Each group gets its own optimizer + Step LR schedule; groups are routed
    by the model's params_divider over top-level param keys via
    optax.multi_transform (the reference's params_divider routes modules to
    optimizer indices, e.g. entropy-model params at lower LR)."""
    import optax

    n_groups = len(cfg_train.optimizer)

    def make_one(i):
        name = cfg_train.optimizer[i].lower()
        lr0 = cfg_train.learning_rate[i]
        step_size = max(cfg_train.lr_step_size[i], 1)
        gamma = cfg_train.lr_step_gamma[i]
        wd = cfg_train.weight_decay[i]
        mom = cfg_train.momentum[i]

        def schedule(step):
            epoch = step // max(steps_per_epoch, 1)
            return lr0 * gamma ** (epoch // step_size)

        if name == 'adamw':
            tx = optax.adamw(schedule, b1=mom, weight_decay=wd)
        elif name == 'adam':
            tx = optax.adam(schedule, b1=mom)
        elif name == 'sgd':
            tx = optax.sgd(schedule, momentum=mom)
        else:
            raise ValueError(f'unknown optimizer {name}')
        if cfg_train.max_grad_norm[i] > 0:
            tx = optax.chain(
                optax.clip_by_global_norm(cfg_train.max_grad_norm[i]), tx)
        return tx

    txs = [make_one(i) for i in range(n_groups)]
    if n_groups == 1:
        return txs[0]

    def label_fn(params):
        return {k: f'g{params_divider(k)}' for k in params}

    return optax.multi_transform({f'g{i}': t for i, t in enumerate(txs)},
                                 label_fn)


# ---------------------------------------------------------------------------
# Prefetch workers. The batch builder must be a module-level function so the
# process pool (fork start method: children inherit _LOADER directly, no
# pickling of the dataset) can run it — the reference uses DataLoader worker
# PROCESSES (reference: train.py:250-260); threads stall on the GIL once
# real datasets stream (numpy-heavy packing).
_LOADER = None            # (dataset, bits, acc, n_dev, local_bs, with_feats)


def _loader_build(idxs):
    from fastpcc_tpu.data.pc_data import pc_batch_to_codes
    dataset, bits, acc, n_dev, local_bs, with_feats = _LOADER
    pcs = [[None] * acc for _ in range(n_dev)]
    cap = 0
    for d in range(n_dev):
        for a in range(acc):
            lo = (d * acc + a) * local_bs
            samples = [dataset[int(i)] for i in idxs[lo:lo + local_bs]]
            pc = pc_batch_to_codes(
                [s['xyz'] for s in samples], bits,
                feats_list=[s['color'] for s in samples]
                if with_feats else None)
            pcs[d][a] = pc
            cap = max(cap, len(pc.codes))
    dev_codes = np.full((n_dev, acc, cap), (1 << 62), np.int64)
    dev_counts = np.zeros((n_dev, acc), np.int32)
    dev_pn = np.zeros((n_dev, acc, local_bs), np.float32)
    dev_feats = None
    for d in range(n_dev):
        for a in range(acc):
            pc = pcs[d][a]
            dev_codes[d, a, :len(pc.codes)] = pc.codes
            dev_counts[d, a] = pc.count
            dev_pn[d, a] = pc.points_num
            if with_feats:
                if dev_feats is None:
                    dev_feats = np.zeros(
                        (n_dev, acc, cap, pc.color.shape[-1]), np.float32)
                dev_feats[d, a, :len(pc.color)] = pc.color
    return dev_codes, dev_counts, dev_pn, dev_feats


def _launch_tensorboard(port: int, logdir: str, logger):
    """Launch a TensorBoard server next to the run (reference:
    train.py:76-111). port=-1 disables; an occupied port probes upward.
    Returns the Popen handle (terminated on normal exit) or None."""
    if port < 0:
        return None
    import shutil
    import socket
    import subprocess
    exe = shutil.which('tensorboard')
    if exe is None:
        logger.info('tensorboard executable not found; not launching')
        return None
    try:
        while True:
            with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
                if s.connect_ex(('localhost', port)) != 0:
                    break
            port += 1
        proc = subprocess.Popen(
            [exe, f'--port={port}', '--logdir', logdir, '--bind_all'],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        # also reaps the child when training crashes (ref train.py:115-121)
        import atexit
        atexit.register(proc.terminate)
        logger.info(f'tensorboard launched on port {port} (logdir {logdir})')
        return proc
    except Exception as e:
        logger.warning(f'failed to launch tensorboard: {e}')
        return None


def main(argv: List[str]):
    cfg = Config()
    assert len(argv) >= 1 and argv[0].endswith('.yaml'), \
        'usage: python train.py <config.yaml> [a.b=c ...]'
    cfg.merge_with_yaml(argv[0])
    cfg.merge_with_dotlist(argv[1:])
    cfg.check()

    run_dir = autoindex_obj(osp.join('runs', cfg.train.rundir_name))
    make_new_dirs(run_dir)   # rotates an existing dir to _bak<N> (ref lib/utils.py:10-17)
    ckpts_dir = osp.join(run_dir, 'ckpts')
    os.makedirs(ckpts_dir, exist_ok=True)
    logger = make_logger('fastpcc', osp.join(run_dir, 'log.txt'))
    with open(osp.join(run_dir, 'config.yaml'), 'w') as f:
        f.write(cfg.to_yaml())
    logger.info(f'run dir: {run_dir}')

    import jax
    if cfg.train.device == 'cpu':
        # env-var setdefault is NOT enough: some rigs bake JAX_PLATFORMS
        # into the environment (and a sitecustomize may pre-register a TPU
        # plugin), so override through jax.config after import.
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import optax
    jax.config.update('jax_default_matmul_precision',
                      {'highest': 'highest', 'high': 'default',
                       'medium': 'bfloat16'}.get(
                           cfg.float32_matmul_precision, 'default'))
    from fastpcc_tpu.parallel import make_mesh, make_dp_train_step, shard_batch
    from fastpcc_tpu.data.pc_data import pc_batch_to_codes

    try:
        from torch.utils.tensorboard import SummaryWriter
        tb = SummaryWriter(osp.join(run_dir, 'tb'))
    except Exception:
        tb = None
    tb_proc = _launch_tensorboard(cfg.train.tensorboard_port,
                                  osp.join(run_dir, 'tb'), logger) \
        if tb is not None else None

    model_mod = importlib.import_module(cfg.model_module_path)
    if cfg.train.amp_dtype and hasattr(cfg.model, 'compute_dtype'):
        # train.amp_dtype is the harness-level AMP switch (reference
        # train.py uses a global autocast dtype); the per-model
        # compute_dtype is the mechanism that actually threads through
        # the forward pass, so the harness flag overrides it.
        cfg.model.compute_dtype = cfg.train.amp_dtype
        logger.info(f'train.amp_dtype={cfg.train.amp_dtype} overrides '
                    f'model.compute_dtype')
    model = model_mod.Model(cfg.model)
    dataset_mod = importlib.import_module(cfg.train.dataset_module_path)
    dataset = dataset_mod.Dataset(cfg.train.dataset, True, logger)
    logger.info(f'dataset: {len(dataset)} samples')

    params = model.init_params(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info(f'model params: {n_params / 1e6:.2f}M')

    steps_per_epoch = max(len(dataset) // cfg.train.batch_size, 1)
    divider = getattr(model, 'params_divider', lambda name: 0)
    tx = build_optimizer(cfg.train, divider, steps_per_epoch)
    opt_state = tx.init(params)

    start_epoch = 0
    ema_params = None
    if cfg.train.from_ckpt:
        ckpt = load_checkpoint(cfg.train.from_ckpt)
        if 'state_dict' in cfg.train.resume_items:
            params, _ = load_loose_params(params, ckpt['state_dict'], logger)
        if 'optimizer_state_dict' in cfg.train.resume_items \
                and 'optimizer_state_dict' in ckpt:
            opt_state = ckpt['optimizer_state_dict']
        if 'scheduler_state_dict' in cfg.train.resume_items:
            start_epoch = ckpt.get('last_epoch', -1) + 1
        logger.info(f'resumed from {cfg.train.from_ckpt} @ epoch {start_epoch}')
    if cfg.train.ema:
        ema_params = jax.tree.map(lambda x: x.astype(jnp.float32), params)

    with_feats = bool(getattr(model, 'requires_point_feats', False))
    acc = max(cfg.train.grad_acc_steps, 1)
    if cfg.train.data_parallel:
        n_dev = cfg.train.data_parallel
        assert cfg.train.batch_size % (n_dev * acc) == 0, \
            f'batch_size {cfg.train.batch_size} % (devices*acc) != 0'
    else:
        # largest device count that divides the per-accumulation batch
        n_dev = math.gcd(jax.local_device_count(),
                         max(cfg.train.batch_size // acc, 1))
    mesh = make_mesh(n_dev)
    local_bs = cfg.train.batch_size // (n_dev * acc)
    step_fn = make_dp_train_step(model.train_loss, tx, mesh, acc,
                                 with_feats=with_feats)
    logger.info(f'data parallel over {n_dev} device(s), '
                f'{acc} microbatch(es) x {local_bs} sample(s)/device')

    bits = model.bits
    rng = np.random.default_rng(0)
    global_step = 0
    step_time_ema = None

    global _LOADER
    _LOADER = (dataset, bits, acc, n_dev, local_bs, with_feats)

    import collections
    import concurrent.futures
    pool = None
    if cfg.train.num_workers > 0:
        if cfg.train.worker_mode == 'process':
            import multiprocessing as mp
            pool = concurrent.futures.ProcessPoolExecutor(
                max_workers=cfg.train.num_workers,
                mp_context=mp.get_context('fork'))
        else:
            pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=cfg.train.num_workers)
    depth = max(cfg.train.prefetch_factor, 1) * max(cfg.train.num_workers, 1)

    for epoch in range(start_epoch, cfg.train.epochs):
        order = rng.permutation(len(dataset)) if cfg.train.shuffle \
            else np.arange(len(dataset))
        slices = [order[it * cfg.train.batch_size:
                        (it + 1) * cfg.train.batch_size]
                  for it in range(steps_per_epoch)]
        pending = collections.deque()
        next_submit = 0
        for it in range(steps_per_epoch):
            t0 = time.perf_counter()
            if pool is not None:
                while next_submit < steps_per_epoch and len(pending) < depth:
                    pending.append(pool.submit(_loader_build,
                                               slices[next_submit]))
                    next_submit += 1
                dev_codes, dev_counts, dev_pn, dev_feats = \
                    pending.popleft().result()
            else:
                dev_codes, dev_counts, dev_pn, dev_feats = \
                    _loader_build(slices[it])
            if with_feats:
                codes, counts, pn, feats = shard_batch(
                    mesh, dev_codes, dev_counts, dev_pn, dev_feats)
                params, opt_state, loss, aux = step_fn(
                    params, opt_state, codes, counts, pn,
                    np.int32(global_step), feats)
            else:
                codes, counts, pn = shard_batch(mesh, dev_codes, dev_counts,
                                                dev_pn)
                params, opt_state, loss, aux = step_fn(
                    params, opt_state, codes, counts, pn,
                    np.int32(global_step))
            global_step += 1
            if cfg.train.ema:
                d = ema_decay(global_step, cfg.train.ema_decay,
                              cfg.train.ema_warmup, cfg.train.ema_warmup_gamma,
                              cfg.train.ema_warmup_power)
                ema_params = ema_update(ema_params, params, d)
            dt = time.perf_counter() - t0
            step_time_ema = dt if step_time_ema is None \
                else 0.9 * step_time_ema + 0.1 * dt
            if global_step % cfg.train.log_frequency == 0:
                loss_v = float(loss)
                remaining = (cfg.train.epochs - epoch) * steps_per_epoch - it
                logger.info(
                    f'epoch {epoch} step {it}/{steps_per_epoch} '
                    f'loss {loss_v:.4f} {step_time_ema:.2f}s/step '
                    f'ETA {eta_by_seconds(remaining * step_time_ema)}')
                if tb is not None:
                    tb.add_scalar('train/loss', loss_v, global_step)
                    for k, v in aux.items():
                        if k != 'loss':
                            tb.add_scalar(f'train/{k}', float(v), global_step)

        if (epoch + 1) % cfg.train.ckpt_frequency == 0 \
                or epoch == cfg.train.epochs - 1:
            path = osp.join(ckpts_dir, f'epoch_{epoch}.pt')
            save_checkpoint(path, params, opt_state, epoch, ema_params)
            logger.info(f'saved {path}')

        if cfg.train.test_frequency and (epoch + 1) % cfg.train.test_frequency == 0:
            from test import run_test
            eval_params = ema_params if ema_params is not None else params
            metrics = run_test(cfg, model, eval_params, logger,
                               osp.join(run_dir, f'test_epoch{epoch}'))
            if tb is not None:
                for k, v in metrics.items():
                    tb.add_scalar(f'test/{k}', v, global_step)

    if pool is not None:
        pool.shutdown()
    if tb_proc is not None:
        tb_proc.terminate()
    logger.info('training done')


if __name__ == '__main__':
    try:
        main(sys.argv[1:])
    except Exception:
        # mirror the reference: the crash traceback lands in log.txt
        # too, not only on stderr (ref train.py:115-121)
        import logging
        logging.getLogger('fastpcc').exception('training crashed')
        raise

