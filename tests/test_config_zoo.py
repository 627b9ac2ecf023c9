"""Every shipped YAML in config/ must parse, auto-import its model/dataset
configs, and pass type checking (the reference ships ~100 such configs;
scripts/test_batch.py sweeps them)."""
import glob
import os

import pytest

from fastpcc_tpu.config import Config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
YAMLS = sorted(glob.glob(os.path.join(ROOT, 'config', '**', '*.yaml'),
                         recursive=True))


@pytest.mark.parametrize('path', YAMLS, ids=[os.path.relpath(p, ROOT)
                                             for p in YAMLS])
def test_config_loads(path):
    cfg = Config()
    cwd = os.getcwd()
    os.chdir(ROOT)   # includes are repo-root-relative
    try:
        cfg.merge_with_yaml(path)
    finally:
        os.chdir(cwd)
    cfg.check()
    assert cfg.model_module_path.startswith('fastpcc_tpu.models.')
    assert cfg.model is not None
