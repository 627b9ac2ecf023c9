"""Root / train / test config schema (reference: lib/config.py:10-120).

The public UX is preserved (same field names where they make sense), with
TPU-native replacements: ``device`` selects a JAX platform/mesh instead of
CUDA ordinals, ``amp_dtype`` defaults to bfloat16 compute, and DDP knobs are
replaced by mesh data-parallel settings.
"""
from dataclasses import dataclass, field
from typing import Tuple, Union

from .simple_config import SimpleConfig

int_or_seq = Union[int, Tuple[int, ...]]
float_or_seq = Union[float, Tuple[float, ...]]
str_or_seq = Union[str, Tuple[str, ...]]

_ALL_RESUME_ITEMS = ('state_dict', 'optimizer_state_dict', 'scheduler_state_dict')


@dataclass
class TrainConfig(SimpleConfig):
    rundir_name: str = 'train_<autoindex>'
    device: str = ''          # '' = default JAX backend; 'cpu' forces CPU
    data_parallel: int = 0    # 0 = all local devices
    batch_size: int = 2       # global batch size (split across the mesh)
    shuffle: bool = True
    num_workers: int = 4
    # 'process' = fork-based worker pool (the reference's DataLoader-worker
    # analog; numpy-heavy packing would stall threads on the GIL);
    # 'thread' = in-process fallback.
    worker_mode: str = 'process'
    prefetch_factor: int = 2
    epochs: int = 100
    # TensorBoard server auto-launch next to the run (reference:
    # train.py:76-111). -1 disables (default here: headless rigs);
    # an occupied port probes upward.
    tensorboard_port: int = -1

    ema: bool = False
    ema_decay: float = 0.9999
    ema_warmup: bool = False
    ema_warmup_gamma: float = 1.0
    ema_warmup_power: float = 3 / 4
    amp_dtype: str = ''       # '' | 'bfloat16' — overrides model.compute_dtype

    optimizer: str_or_seq = ('SGD', 'SGD')
    learning_rate: float_or_seq = 0.05
    momentum: float_or_seq = 0.9
    weight_decay: float_or_seq = 0.0
    max_grad_norm: float_or_seq = 0.0
    grad_acc_steps: int = 1

    scheduler: str_or_seq = 'Step'
    lr_step_size: int_or_seq = 25
    lr_step_gamma: float_or_seq = 0.3

    from_ckpt: str = ''
    resume_items: Tuple[str, ...] = ('state_dict',)

    log_frequency: int = 20   # steps
    ckpt_frequency: int = 2   # epochs
    test_frequency: int = 0   # epochs; 0 = no in-training test

    dataset_module_path: str = ''
    dataset: SimpleConfig = None

    def merge_with_dict(self, d):
        if 'resume_items' in d and 'all' in d['resume_items']:
            d = dict(d)
            d['resume_items'] = list(_ALL_RESUME_ITEMS)
        return super().merge_with_dict(d)

    def check_local_value(self):
        for item in self.resume_items:
            assert item in _ALL_RESUME_ITEMS, item
        assert self.ckpt_frequency > 0
        assert self.amp_dtype in ('', 'bfloat16', 'float16'), self.amp_dtype
        if isinstance(self.optimizer, str):
            self.optimizer = (self.optimizer,)
        # broadcast per-param-group scalars to tuples matching optimizer count
        # (reference: lib/config.py:64-86)
        for key in ('learning_rate', 'momentum', 'weight_decay', 'max_grad_norm',
                    'scheduler', 'lr_step_size', 'lr_step_gamma'):
            v = getattr(self, key)
            if isinstance(v, (tuple, list)):
                assert len(v) == len(self.optimizer), \
                    f'len(cfg.{key}) != len(cfg.optimizer): {v} vs {self.optimizer}'
                setattr(self, key, tuple(v))
            else:
                setattr(self, key, (v,) * len(self.optimizer))


@dataclass
class TestConfig(SimpleConfig):
    rundir_name: str = 'test_<autoindex>'
    device: str = ''
    batch_size: int = 1
    num_workers: int = 0
    from_ckpt: str = ''
    log_frequency: int = 1
    # Pallas windowed-conv eval path (ops/pallas_conv.py); auto-disabled on
    # non-TPU backends, silently inert for non-qualifying shapes/dtypes.
    fast_conv: bool = True

    dataset_module_path: str = ''
    dataset: SimpleConfig = None


@dataclass
class Config(SimpleConfig):
    model_module_path: str = ''
    model: SimpleConfig = None

    float32_matmul_precision: str = 'high'  # 'highest' | 'high' | 'medium'
    more_reproducible: bool = False

    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
