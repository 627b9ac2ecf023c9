"""Config system tests (behavioral parity with reference lib/simple_config.py)."""
import os.path as osp
import sys
from dataclasses import dataclass, field
from typing import Optional, Tuple, Union

import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from fastpcc_tpu.config import SimpleConfig, Config, TrainConfig


@dataclass
class Inner(SimpleConfig):
    a: int = 1
    b: Tuple[int, ...] = (1, 2)
    name: str = 'x'


@dataclass
class Outer(SimpleConfig):
    lr: float = 0.1
    flag: bool = False
    opt: Union[str, Tuple[str, ...]] = 'SGD'
    inner: Inner = field(default_factory=Inner)
    maybe: Optional[int] = None


def test_dotlist_merge():
    cfg = Outer()
    cfg.merge_with_dotlist(['lr=0.5', 'flag=True', 'inner.a=7', 'inner.b=(3,4,5)', 'maybe=9'])
    cfg.check()
    assert cfg.lr == 0.5 and cfg.flag is True
    assert cfg.inner.a == 7 and cfg.inner.b == (3, 4, 5)
    assert cfg.maybe == 9


def test_dotlist_list_and_str():
    cfg = Outer()
    cfg.merge_with_dotlist(['opt=(Adam,SGD)', 'inner.name=hello'])
    assert cfg.opt == ('Adam', 'SGD')
    assert cfg.inner.name == 'hello'


def test_type_check_rejects_bad():
    cfg = Outer()
    cfg.merge_with_dict({'lr': 'not_a_float'})
    with pytest.raises(TypeError):
        cfg.check()


def test_unknown_key_rejected():
    cfg = Outer()
    with pytest.raises(KeyError):
        cfg.merge_with_dict({'nope': 1})


def test_yaml_include(tmp_path):
    base = tmp_path / 'base.yaml'
    base.write_text('lr: 0.25\ninner:\n  a: 3\n')
    child = tmp_path / 'child.yaml'
    child.write_text(f'# include "{base}"\nflag: true\ninner:\n  b: [7, 8]\n')
    cfg = Outer().merge_with_yaml(str(child))
    cfg.check()
    assert cfg.lr == 0.25 and cfg.flag is True
    assert cfg.inner.a == 3 and cfg.inner.b == (7, 8)


def test_yaml_roundtrip():
    cfg = Outer()
    cfg.merge_with_dotlist(['lr=0.5', 'inner.a=7'])
    import yaml
    d = yaml.safe_load(cfg.to_yaml())
    assert d['lr'] == 0.5 and d['inner']['a'] == 7


def test_train_config_broadcast():
    cfg = TrainConfig()
    cfg.merge_with_dict({'optimizer': 'AdamW', 'learning_rate': 0.001})
    cfg.check()
    assert cfg.optimizer == ('AdamW',)
    assert cfg.learning_rate == (0.001,)
    assert cfg.scheduler == ('Step',)


def test_resume_items_all_expansion():
    cfg = TrainConfig()
    cfg.merge_with_dict({'resume_items': ['all']})
    cfg.check()
    assert set(cfg.resume_items) == {'state_dict', 'optimizer_state_dict', 'scheduler_state_dict'}


def test_root_config_model_auto_import():
    cfg = Config()
    cfg.merge_with_dotlist(['model_module_path=fastpcc_tpu.models.lossl_coord',
                            'model.channels=32'])
    assert cfg.model is not None
    assert cfg.model.channels == 32


def test_autoindex(tmp_path):
    from fastpcc_tpu.utils import autoindex_obj
    (tmp_path / 'run_0').mkdir()
    (tmp_path / 'run_3').mkdir()
    assert autoindex_obj(str(tmp_path / 'run_<autoindex>')) == str(tmp_path / 'run_4')
    assert autoindex_obj(str(tmp_path / 'run_<maxindex>')) == str(tmp_path / 'run_3')
    assert autoindex_obj(str(tmp_path / 'fresh_<autoindex>')) == str(tmp_path / 'fresh_0')
    assert autoindex_obj(str(tmp_path / 'run_<minindex>')) == str(tmp_path / 'run_0')


def test_make_new_dirs_rotates_existing(tmp_path):
    from fastpcc_tpu.utils import make_new_dirs
    d = tmp_path / 'run'
    make_new_dirs(str(d))
    (d / 'old.txt').write_text('x')
    make_new_dirs(str(d))            # rotates old dir to run_bak0
    assert d.is_dir() and not (d / 'old.txt').exists()
    assert (tmp_path / 'run_bak0' / 'old.txt').read_text() == 'x'
    make_new_dirs(str(d))
    assert (tmp_path / 'run_bak1').is_dir()
