"""Evaluation entry: ``python test.py <config.yaml> a.b=c ...``

Same CLI contract as the reference (reference: test.py:18-157): build model,
load checkpoint (EMA-preferred, loose loading), run the dataset through
compress -> bytes -> decompress, score with the evaluator, write
metric_dict.json / mean_metric.json.
"""
import importlib
import os
import os.path as osp
import sys
from typing import List

import numpy as np

from fastpcc_tpu.config import Config
from fastpcc_tpu.utils import (autoindex_obj, make_new_dirs, Timer,
                               DeviceMemoryMonitor)
from fastpcc_tpu.utils.logging_utils import make_logger
from fastpcc_tpu.utils.checkpoint import load_checkpoint, load_loose_params


def run_test(cfg: Config, model, params, logger, run_dir: str):
    """Shared by the CLI and in-training eval (reference: test.py:51-153)."""
    from fastpcc_tpu.metrics import PCCEvaluator

    dataset_mod = importlib.import_module(cfg.test.dataset_module_path)
    dataset = dataset_mod.Dataset(cfg.test.dataset, False, logger)
    logger.info(f'test dataset: {len(dataset)} samples')
    results_dir = osp.join(run_dir, 'results')
    os.makedirs(results_dir, exist_ok=True)

    evaluator = getattr(model, 'evaluator', None) or PCCEvaluator(
        cal_mpeg_pc_error=bool(getattr(cfg.model, 'cal_mpeg_pc_error', True)),
        cal_avs_pc_evalue=bool(getattr(cfg.model, 'cal_avs_pc_evalue', False)))
    evaluator.reset()
    if hasattr(model, 'pre_test_hook'):
        model.pre_test_hook()

    cfg_partition_cap = getattr(cfg.test.dataset,
                                'kd_tree_partition_max_points_num', 0)
    if isinstance(cfg_partition_cap, (tuple, list)):
        cfg_partition_cap = cfg_partition_cap[0] if cfg_partition_cap else 0

    with_feats = bool(getattr(model, 'requires_point_feats', False))
    for i in range(len(dataset)):
        sample = dataset[i]
        xyz = sample['xyz']
        color = sample.get('color') if with_feats else None
        if with_feats and color is None:
            raise ValueError(f'{cfg.model_module_path} needs per-point RGB '
                             f'but the dataset sample has none')
        # multi-subset datasets carry a per-file cap (reference indexes the
        # per-resolution tuple per file, lib/datasets/PlyVoxel/Base/
        # dataset.py:58-68,254); plain datasets fall back to the config scalar
        partition_cap = sample.get('partition_cap', cfg_partition_cap) \
            or cfg_partition_cap
        if partition_cap and len(xyz) > partition_cap:
            from fastpcc_tpu.data.kd_partition import kd_tree_partition_idx
            idx_parts = kd_tree_partition_idx(xyz, partition_cap)
        else:
            idx_parts = [np.arange(len(xyz))]
        parts = [xyz[ix] for ix in idx_parts]
        cparts = [color[ix] for ix in idx_parts] if with_feats else \
            [None] * len(parts)

        def _compress(p, c):
            return model.compress(params, p, c) if with_feats \
                else model.compress(params, p)

        with Timer() as enc_t, DeviceMemoryMonitor() as enc_m:
            if len(parts) == 1:
                blob = _compress(parts[0], cparts[0])
            else:
                blob = b''.join(
                    len(b).to_bytes(3, 'little') + b
                    for b in (_compress(p, c)
                              for p, c in zip(parts, cparts)))
        with Timer() as dec_t, DeviceMemoryMonitor() as dec_m:
            if len(parts) == 1:
                recon = model.decompress(params, blob)
            else:
                chunks, pos = [], 0
                while pos < len(blob):
                    ln = int.from_bytes(blob[pos:pos + 3], 'little')
                    chunks.append(model.decompress(params,
                                                   blob[pos + 3:pos + 3 + ln]))
                    pos += 3 + ln
                recon = tuple(np.concatenate(c, 0) for c in zip(*chunks)) \
                    if isinstance(chunks[0], tuple) else \
                    np.concatenate(chunks, 0)

        recon_color = None
        if isinstance(recon, tuple):
            recon, recon_color = recon
        recon = recon.astype(np.float64)
        if sample.get('inv_transform') is not None:
            inv = sample['inv_transform']
            recon = recon * inv[3] + inv[None, :3]
            blob = np.asarray(inv, '<f4').tobytes() + blob
        entry = evaluator.log(
            pred=recon, org_points_num=sample['org_points_num'],
            compressed_bytes=blob, file_path=sample['file_path'],
            resolution=sample['resolution'], results_dir=results_dir,
            pred_color=recon_color,
            extra_info_dict={
                'encode time': enc_t.elapsed_time,
                'encode memory': enc_m.max_memory_allocated_kb,
                'decode time': dec_t.elapsed_time,
                'decode memory': dec_m.max_memory_allocated_kb,
                # which auxiliary coders were active (e.g. tmc3 vs the
                # self-contained bincount fallback) — RD numbers are not
                # comparable across coders, so record it per sample
                **(getattr(model, 'extra_metric_info', None) or {}),
            })
        if (i + 1) % max(cfg.test.log_frequency, 1) == 0:
            logger.info(f'[{i + 1}/{len(dataset)}] '
                        f'{osp.basename(str(sample["file_path"]))} '
                        f'bpp={entry["bpp"]:.4f} '
                        f'enc={enc_t.elapsed_time:.3f}s '
                        f'dec={dec_t.elapsed_time:.3f}s')

    metrics = evaluator.show(results_dir)
    if hasattr(model, 'post_test_hook'):
        model.post_test_hook()
    logger.info(f'mean metrics: {metrics}')
    return metrics


def main(argv: List[str]):
    cfg = Config()
    assert len(argv) >= 1 and argv[0].endswith('.yaml'), \
        'usage: python test.py <config.yaml> [a.b=c ...]'
    cfg.merge_with_yaml(argv[0])
    cfg.merge_with_dotlist(argv[1:])
    cfg.check()

    run_dir = autoindex_obj(osp.join('runs', cfg.test.rundir_name))
    make_new_dirs(run_dir)   # rotates an existing dir to _bak<N> (ref lib/utils.py:10-17)
    logger = make_logger('fastpcc', osp.join(run_dir, 'log.txt'))
    with open(osp.join(run_dir, 'config.yaml'), 'w') as f:
        f.write(cfg.to_yaml())

    import jax
    if cfg.test.device == 'cpu':
        # env-var setdefault is NOT enough: some rigs bake JAX_PLATFORMS
        # into the environment (and a sitecustomize may pre-register a TPU
        # plugin), so override through jax.config after import.
        jax.config.update('jax_platforms', 'cpu')

    from fastpcc_tpu.ops.sparse import set_fast_conv, _pallas_interpret
    set_fast_conv(cfg.test.fast_conv and not _pallas_interpret())

    model_mod = importlib.import_module(cfg.model_module_path)
    model = model_mod.Model(cfg.model)
    raw_tree = bool(getattr(model, 'raw_param_tree', False))
    if raw_tree and not cfg.test.from_ckpt:
        raise ValueError(f'{cfg.model_module_path} has no trainable float '
                         f'parameters: test.from_ckpt must point at its '
                         f'converted checkpoint (run the *_quantize config '
                         f'first)')
    params = None if raw_tree else model.init_params(jax.random.PRNGKey(0))
    if cfg.test.from_ckpt:
        ckpt = load_checkpoint(cfg.test.from_ckpt)
        loaded = ckpt.get('ema_state_dict') or ckpt['state_dict']
        if raw_tree:
            params = loaded
        else:
            params, _ = load_loose_params(params, loaded, logger)
        logger.info(f'loaded {cfg.test.from_ckpt} '
                    f'({"ema" if "ema_state_dict" in ckpt else "raw"})')

    run_test(cfg, model, params, logger, run_dir)


if __name__ == '__main__':
    try:
        main(sys.argv[1:])
    except Exception:
        # mirror the reference: the crash traceback lands in log.txt
        # too, not only on stderr (ref train.py:115-121)
        import logging
        logging.getLogger('fastpcc').exception('testing crashed')
        raise

