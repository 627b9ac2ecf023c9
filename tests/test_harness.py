"""End-to-end harness test: train.py main() for two tiny epochs on the
synthetic dataset, checkpoint, then test.py main() consuming the checkpoint
and producing metric_dict.json / mean_metric.json (the reference's top-level
UX, SURVEY §2.1)."""
import glob
import json
import os
import os.path as osp
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_train_then_test(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs('config', exist_ok=True)

    import train as train_mod
    import test as test_mod

    cfg_path = osp.join(REPO, 'config/lossl_coord/synthetic_smoke.yaml')
    overrides = [
        'model.channels=8',
        'model.max_stride=64',
        'model.max_stride_wo_recurrent=16',
        'model.fea_stride=4',
        'model.coord_bits=10',
        'model.coder_lanes=8',
        'train.batch_size=2',
        'train.epochs=2',
        'train.ckpt_frequency=1',
        'train.dataset.num_samples=2',
        'train.dataset.resolution=512',
        'train.dataset.kd_tree_partition_max_points_num=2000',
        'test.dataset.num_samples=1',
        'test.dataset.resolution=512',
    ]
    train_mod.main([cfg_path] + overrides)

    ckpts = sorted(glob.glob('runs/train_smoke_*/ckpts/*.pt'))
    assert ckpts, 'no checkpoint written'

    test_mod.main([cfg_path] + overrides + [f'test.from_ckpt={ckpts[-1]}'])
    metric_files = glob.glob('runs/test_smoke_*/results/mean_metric.json')
    assert metric_files
    with open(metric_files[0]) as f:
        metrics = json.load(f)
    assert metrics['bpp'] > 0
    assert metrics['input_points_num'] == metrics['output_points_num'], \
        'lossless model must reconstruct exactly'


@pytest.mark.slow
def test_color_train_then_test(tmp_path, monkeypatch):
    """Joint geometry+color model through the full harness: per-point RGB
    features flow dataset -> pc_batch_to_codes -> with_feats DP step, and
    test.py routes (xyz, rgb) reconstructions into the evaluator."""
    monkeypatch.chdir(tmp_path)

    import train as train_mod
    import test as test_mod

    cfg_path = osp.join(REPO, 'config/lossy_coord_lossy_color/smoke.yaml')
    overrides = ['train.num_workers=0']
    train_mod.main([cfg_path] + overrides)

    ckpts = sorted(glob.glob('runs/train_color_smoke_*/ckpts/*.pt'))
    assert ckpts, 'no checkpoint written'

    test_mod.main([cfg_path] + overrides + [f'test.from_ckpt={ckpts[-1]}'])
    metric_files = glob.glob('runs/test_color_smoke_*/results/mean_metric.json')
    assert metric_files
    with open(metric_files[0]) as f:
        metrics = json.load(f)
    assert metrics['bpp'] > 0
    assert metrics['output_points_num'] > 0


@pytest.mark.slow
def test_quantize_then_int_test(tmp_path, monkeypatch):
    """PTQ through the harness (reference flow, lossl_coord/model.py:633-642):
    train tiny float flagship -> *_quantize-style run (test pass doubles as
    calibration, post_test_hook saves the int ckpt) -> int model run via
    test.py consuming the converted checkpoint, still lossless."""
    monkeypatch.chdir(tmp_path)

    import train as train_mod
    import test as test_mod

    cfg_path = osp.join(REPO, 'config/lossl_coord/synthetic_smoke.yaml')
    overrides = [
        'model.channels=8',
        'model.max_stride=64',
        'model.max_stride_wo_recurrent=16',
        'model.fea_stride=4',
        'model.coord_bits=10',
        'model.coder_lanes=8',
        'train.batch_size=2',
        'train.epochs=1',
        'train.ckpt_frequency=1',
        'train.dataset.num_samples=2',
        'train.dataset.resolution=512',
        'train.dataset.kd_tree_partition_max_points_num=2000',
        'test.dataset.num_samples=1',
        'test.dataset.resolution=512',
    ]
    train_mod.main([cfg_path] + overrides)
    ckpts = sorted(glob.glob('runs/train_smoke_*/ckpts/*.pt'))
    assert ckpts

    # quantize pass: float test run that calibrates + saves the int ckpt
    test_mod.main([cfg_path] + overrides + [
        f'test.from_ckpt={ckpts[-1]}',
        'model.quantize_param=True',
        'model.int_param_save_path=weights/smoke_int.pt',
    ])
    assert osp.exists('weights/smoke_int.pt'), 'int checkpoint not saved'

    # integer-only run through the same harness
    test_mod.main([cfg_path] + overrides + [
        'model_module_path=fastpcc_tpu.models.lossl_coord_int',
        'test.from_ckpt=weights/smoke_int.pt',
    ])
    metric_files = sorted(glob.glob('runs/test_smoke_*/results/mean_metric.json'))
    assert len(metric_files) >= 2
    with open(metric_files[-1]) as f:
        metrics = json.load(f)
    assert metrics['bpp'] > 0
    assert metrics['input_points_num'] == metrics['output_points_num'], \
        'int model must stay lossless'
