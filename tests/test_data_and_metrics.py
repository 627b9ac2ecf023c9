"""Host-side data layer + metrics tests: PlyVoxel / ShapeNet loaders on
synthesized files, evaluator JSON outputs, D1/D2 PSNR sanity, BD-rate."""
import json
import os.path as osp

import numpy as np
import pytest

from fastpcc_tpu.data.ply_io import write_ply, read_ply


def test_plyvoxel_dataset(tmp_path):
    from fastpcc_tpu.data.datasets.PlyVoxel import Dataset, Config
    rng = np.random.default_rng(0)
    for i in range(3):
        xyz = rng.integers(0, 512, (500, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, (500, 3)).astype(np.uint8)
        write_ply(str(tmp_path / f'frame_{i}.ply'), xyz, rgb=rgb)
    cfg = Config()
    cfg.root = str(tmp_path)
    cfg.resolution = 512
    cfg.with_color = True
    cfg.check()
    ds = Dataset(cfg, is_training=False)
    assert len(ds) == 3
    s = ds[0]
    assert s['xyz'].dtype == np.int32
    assert 'color' in s and len(s['color']) == len(s['xyz'])

    # coord scaler + inv_transform round trip
    cfg2 = Config()
    cfg2.root = str(tmp_path)
    cfg2.coord_scaler = 0.5
    cfg2.check()
    ds2 = Dataset(cfg2, is_training=False)
    s2 = ds2[0]
    assert s2['inv_transform'][3] == 2.0


def test_plyvoxel_ref_frames(tmp_path):
    """Inter-frame fields (reference: lib/datasets/PlyVoxel/Base/
    dataset.py:74-135): with ref_frames_num > 0 the loader attaches the
    preceding frames' voxelized coords (+frame-index column when several)
    and their attributes; missing predecessors are skipped."""
    from fastpcc_tpu.data.datasets.PlyVoxel import Dataset, Config
    rng = np.random.default_rng(3)
    clouds = []
    for i in range(3):
        xyz = rng.integers(0, 256, (200 + 10 * i, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, (len(xyz), 3)).astype(np.uint8)
        write_ply(str(tmp_path / f'frame_{i:04d}.ply'), xyz, rgb=rgb)
        clouds.append(xyz)
    cfg = Config()
    cfg.root = str(tmp_path)
    cfg.with_color = True
    cfg.ref_frames_num = 2
    cfg.check()
    ds = Dataset(cfg, is_training=False)

    s0 = ds[0]                       # frame 0: no predecessors at all
    assert 'xyzt_ref' not in s0
    s2 = ds[2]                       # frame 2: refs = frames 0 and 1
    ref = s2['xyzt_ref']
    assert ref.shape[1] == 4         # frame-index column (ref_frames_num>1)
    n0 = len(np.unique(np.round(clouds[0]).astype(np.int32), axis=0))
    n1 = len(np.unique(np.round(clouds[1]).astype(np.int32), axis=0))
    assert len(ref) == n0 + n1
    assert set(np.unique(ref[:, 3]).tolist()) == {0, 1}
    assert len(s2['color_ref']) == len(ref)

    cfg1 = Config()
    cfg1.root = str(tmp_path)
    cfg1.ref_frames_num = 1
    cfg1.check()
    s1 = Dataset(cfg1, is_training=False)[1]
    assert s1['xyzt_ref'].shape[1] == 3     # single ref: plain xyz

    # PCData carries the fields through
    from fastpcc_tpu.data.pc_data import PCData
    pcd = PCData(xyzt_ref=ref)
    assert pcd.xyzt_ref is ref and pcd.color_ref is None


def test_shapenet_obj_sampling(tmp_path):
    from fastpcc_tpu.data.datasets.ShapeNetCorev2.dataset import (
        load_obj_mesh, sample_mesh_uniform)
    obj = tmp_path / 'cube.obj'
    obj.write_text(
        'v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n'
        'v 0 0 1\nv 1 0 1\nv 1 1 1\nv 0 1 1\n'
        'f 1 2 3 4\nf 5 6 7 8\nf 1 2 6 5\n')
    verts, faces = load_obj_mesh(str(obj))
    assert verts.shape == (8, 3)
    assert faces.shape == (6, 3)  # fan-triangulated quads
    pts = sample_mesh_uniform(verts, faces, 1000, np.random.default_rng(0))
    assert pts.shape == (1000, 3)
    assert pts.min() >= -1e-9 and pts.max() <= 1 + 1e-9


def test_shapenet_dataset_cache(tmp_path):
    from fastpcc_tpu.data.datasets.ShapeNetCorev2 import Dataset, Config
    model_dir = tmp_path / 'cat' / 'obj1' / 'models'
    model_dir.mkdir(parents=True)
    (model_dir / 'model_normalized.obj').write_text(
        'v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n')
    cfg = Config()
    cfg.root = str(tmp_path)
    cfg.mesh_sample_points_num = 2000
    cfg.resolution = 64
    cfg.check()
    ds = Dataset(cfg, is_training=True)
    assert len(ds) == 1
    s = ds[0]
    assert (s['xyz'] >= 0).all() and (s['xyz'] < 64).all()
    # second load hits the npz cache
    s2 = ds[0]
    assert len(s2['xyz']) > 10


def test_evaluator_outputs(tmp_path):
    from fastpcc_tpu.metrics import PCCEvaluator
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (400, 3)).astype(np.float64)
    ref_path = str(tmp_path / 'ref.ply')
    write_ply(ref_path, ref.astype(np.float32))
    pred = ref + rng.normal(0, 0.5, ref.shape)
    ev = PCCEvaluator()
    ev.log(pred=pred, org_points_num=400, compressed_bytes=b'x' * 100,
           file_path=ref_path, resolution=256,
           results_dir=str(tmp_path / 'out'),
           extra_info_dict={'encode time': 0.1, 'decode time': 0.2})
    mean = ev.show(str(tmp_path / 'out'))
    assert mean['bpp'] == pytest.approx(100 * 8 / 400)
    assert 'mseF,PSNR (p2point)' in mean and mean['mseF,PSNR (p2point)'] > 20
    with open(tmp_path / 'out' / 'metric_dict.json') as f:
        md = json.load(f)
    assert ref_path in md
    assert osp.isfile(tmp_path / 'out' / 'ref_recon.ply')


def test_d1_psnr_perfect_and_noisy():
    from fastpcc_tpu.metrics import compute_d1_d2_psnr
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 1024, (500, 3)).astype(np.float64)
    exact = compute_d1_d2_psnr(ref, ref, 1024, compute_d2=False)
    assert exact['mseF,PSNR (p2point)'] == float('inf')
    noisy = compute_d1_d2_psnr(ref + 1.0, ref, 1024, compute_d2=True)
    assert 50 < noisy['mseF,PSNR (p2point)'] < 70
    assert noisy['mseF,PSNR (p2plane)'] >= noisy['mseF,PSNR (p2point)'] - 1


def test_bd_rate_sign():
    from fastpcc_tpu.metrics import bd_rate, bd_psnr
    rates = [0.1, 0.2, 0.4, 0.8]
    psnrs = [60, 65, 70, 75]
    better = [r * 0.8 for r in rates]   # 20% cheaper at same quality
    assert bd_rate(rates, psnrs, better, psnrs) == pytest.approx(-20, abs=0.5)
    assert bd_psnr(rates, psnrs, better, psnrs) > 0


def test_precision_recall_and_yuv():
    from fastpcc_tpu.metrics.misc import (precision_recall, rgb_to_yuv_bt709,
                                          yuv_to_rgb_bt709)
    pr = precision_recall(np.array([1, 1, 0, 0], bool),
                          np.array([1, 0, 1, 0], bool))
    assert pr['precision'] == 0.5 and pr['recall'] == 0.5
    rgb = np.random.default_rng(3).integers(0, 256, (50, 3)).astype(np.float64)
    back = yuv_to_rgb_bt709(rgb_to_yuv_bt709(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_color_psnr_metric(tmp_path):
    """Evaluator color PSNR: identical colors -> inf PSNR; noisy -> finite."""
    import numpy as np
    from fastpcc_tpu.metrics.pc_error import compute_color_psnr
    rng = np.random.default_rng(0)
    xyz = rng.integers(0, 64, size=(300, 3)).astype(np.float64)
    xyz = np.unique(xyz, axis=0)
    rgb = rng.integers(0, 256, size=(len(xyz), 3)).astype(np.float64)
    out = compute_color_psnr(xyz, rgb, xyz, rgb)
    assert out['c[3],PSNRF'] == float('inf')
    noisy = np.clip(rgb + rng.normal(0, 5, rgb.shape), 0, 255)
    out2 = compute_color_psnr(xyz, noisy, xyz, rgb)
    assert 20 < out2['c[0],PSNRF'] < 60
    assert out2['c[3],PSNRF'] == (6 * out2['c[0],PSNRF'] + out2['c[1],PSNRF']
                                  + out2['c[2],PSNRF']) / 8


def test_kd_partition_idx_alignment():
    from fastpcc_tpu.data.kd_partition import (
        kd_tree_partition, kd_tree_partition_idx,
        kd_tree_partition_randomly, kd_tree_partition_randomly_idx)
    rng = np.random.default_rng(3)
    xyz = rng.integers(0, 512, (5000, 3)).astype(np.int32)
    parts = kd_tree_partition(xyz, 800)
    idxs = kd_tree_partition_idx(xyz, 800)
    assert len(parts) == len(idxs)
    for p, ix in zip(parts, idxs):
        assert np.array_equal(p, xyz[ix])
    assert sorted(np.concatenate(idxs).tolist()) == list(range(len(xyz)))
    r1 = kd_tree_partition_randomly(xyz, 700, np.random.default_rng(5))
    ix = kd_tree_partition_randomly_idx(xyz, 700, np.random.default_rng(5))
    assert np.array_equal(r1, xyz[ix]) and len(ix) <= 700


def test_synthetic_color_dataset():
    from fastpcc_tpu.data.datasets.Synthetic import Dataset, Config
    ds = Dataset(Config(kind='surface', num_samples=1, resolution=256,
                        with_color=True), False)
    s = ds[0]
    assert s['color'].shape == (len(s['xyz']), 3)
    assert s['color'].dtype == np.uint8


def test_reflectance_roundtrip_through_evaluator(tmp_path):
    """A reflectance-carrying PLY scores a reflectance PSNR through the
    evaluator (reference: lib/evaluators.py:57,97 pred_reflectance ->
    pc_error --lidar; here the in-process r,PSNRF fallback)."""
    from fastpcc_tpu.data.ply_io import write_ply, read_ply
    from fastpcc_tpu.metrics.evaluator import PCCEvaluator
    rng = np.random.default_rng(3)
    xyz = np.unique(rng.integers(0, 256, (512, 3)), axis=0)
    refl = rng.integers(0, 256, (len(xyz),)).astype(np.uint16)
    src = str(tmp_path / 'in.ply')
    write_ply(src, xyz, reflectance=refl)
    back = read_ply(src)
    assert np.array_equal(back['reflectance'].reshape(-1), refl)

    ev = PCCEvaluator(compute_d2=False, max_workers=1)
    ev.log(xyz.astype(np.float64), len(xyz), b'\x00' * 64, src, 256,
           results_dir=str(tmp_path / 'out'),
           pred_reflectance=refl)
    ev.show(results_dir=str(tmp_path / 'out'))
    exact = ev.metric_dict[src]['r,PSNRF']
    assert exact == float('inf') or exact > 99
    # lossy reflectance scores finitely
    ev.reset()
    noisy = np.clip(refl.astype(np.int32) + 8, 0, 255).astype(np.uint16)
    ev.log(xyz.astype(np.float64), len(xyz), b'\x00' * 64, src, 256,
           pred_reflectance=noisy)
    mean = ev.show()
    assert 20 < mean['r,PSNRF'] < 99
    # recon ply carries the reflectance property
    rec = read_ply(str(tmp_path / 'out' / 'in_recon.ply'))
    assert 'reflectance' in rec


def test_plyvoxel_presets_import():
    """Preset subclasses mirror the reference's per-CTC-class dataset configs
    (reference: lib/datasets/PlyVoxel/MPEG_GPCC_CTC_Solid.py:1-16)."""
    import importlib
    for name in ('MPEG_GPCC_CTC_Solid', 'MPEG_GPCC_CTC_Solid_MVUB',
                 'MPEG_GPCC_CTC_DenseVox14_Solid_MVUB'):
        mod = importlib.import_module(
            f'fastpcc_tpu.data.datasets.PlyVoxel.{name}')
        cfg = mod.Config()
        assert len(cfg.root) == len(cfg.filelist_path) == len(cfg.resolution)
        assert mod.Dataset is not None


def test_avs_pc_evalue_wrapper(tmp_path, monkeypatch):
    """cal_avs_pc_evalue flag -> avs_pc_evalue wrapper: CLI args and the
    sectioned-stdout parse match the reference schema
    (reference: lib/metrics/pc_error_wrapper.py:110-156), exercised with a
    faked binary; unset $PC_EVALUE_BIN means a silent {} (binary-gated)."""
    from fastpcc_tpu.metrics.pc_error import avs_pc_evalue
    monkeypatch.delenv('PC_EVALUE_BIN', raising=False)
    assert avs_pc_evalue('a.ply', 'b.ply', 1024) == {}

    fake = tmp_path / 'pc_evalue'
    fake.write_text('\n'.join([
        '#!/bin/sh',
        'echo "args: $@" >&2',
        'echo " point cloud size: 1234"',
        'echo "1. Take original point cloud as reference:"',
        'echo "   mseF      (p2point): 0.25"',
        'echo "   mseF,PSNR (p2point): 60.1"',
        'echo "2. Take reconstruct point cloud as reference:"',
        'echo "   mseF      (p2point): 0.5"',
        'echo "3. Symmetric result:"',
        'echo "   mseF      (p2point): 0.5"',
        'echo "   mseF,PSNR (p2point): 57.2"',
        'echo "Point cloud evalue processing time: 0.8s"',
        'echo "   after-the-end: 99.0"',
    ]) + '\n')
    fake.chmod(0o755)
    out = avs_pc_evalue('a.ply', 'b.ply', 1024, color=True,
                        binary=str(fake))
    assert out['org points num'] == 1234
    # later sections overwrite earlier (symmetric result wins), the
    # post-divider line is never read
    assert out['mseF      (p2point)'] == 0.5
    assert out['mseF,PSNR (p2point)'] == 57.2
    assert 'after-the-end' not in out

    monkeypatch.setenv('PC_EVALUE_BIN', str(fake))
    out2 = avs_pc_evalue('a.ply', 'b.ply', 1024)
    assert out2['org points num'] == 1234


def test_compare_performance_published_anchors(tmp_path, capsys):
    """--anchors mode: lossless entries compare mean bpp vs literature
    anchors; lossy entries BD-rate the dataset-mean curve vs anchor curves
    (VERDICT r3 #6: surrogate runs judged against published numbers,
    explicitly labeled as a trend signal)."""
    import sys
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'scripts'))
    from compare_performance import compare_published_anchors

    run = {'r1': {'a.ply': {'bpp': 0.30, 'mseF,PSNR (p2point)': 68.0},
                  'b.ply': {'bpp': 0.34, 'mseF,PSNR (p2point)': 67.0}},
           'r2': {'a.ply': {'bpp': 0.60, 'mseF,PSNR (p2point)': 72.0},
                  'b.ply': {'bpp': 0.62, 'mseF,PSNR (p2point)': 71.0}}}
    run_path = tmp_path / 'run.json'
    run_path.write_text(json.dumps(run))
    anchors = {'published_anchors': {
        'lossless_ds': {'task': 'lossless-geometry', 'metric': 'bpp',
                        'dataset': 'ds', 'anchors': {'gpcc': 0.9}},
        'lossy_ds': {'task': 'lossy-geometry',
                     'metric': 'mseF,PSNR (p2point)', 'dataset': 'ds',
                     'anchors': {'gpcc': {'bpp': [0.2, 0.4, 0.8],
                                          'psnr': [64.0, 68.0, 72.0]}}}}}
    anchors_path = tmp_path / 'anchors.json'
    anchors_path.write_text(json.dumps(anchors))

    compare_published_anchors([('ours', str(run_path))],
                              str(anchors_path), 'lossless_ds')
    out = capsys.readouterr().out
    assert 'mean bpp 0.465' in out and '0.52x anchor rate' in out
    assert 'NOT a parity claim' in out

    compare_published_anchors([('ours', str(run_path))],
                              str(anchors_path), 'lossy_ds')
    out = capsys.readouterr().out
    assert 'BD-rate' in out and 'gpcc' in out

    with pytest.raises(SystemExit):
        compare_published_anchors([('ours', str(run_path))],
                                  str(anchors_path), 'nope')
