"""Configuration tree: one dataclass hierarchy replacing the reference's
three overlapping systems (yacs CfgNode + per-script argparse promotion +
the vendored AttrDict params; config/default.py, cdiffuse/params.py).

Reproduces the same keys/defaults, YAML overlays with recursive ``BASE``
inheritance (default.py:66-78), ``--opts KEY VALUE`` dot-path overrides
(default.py:85-86), and the NOISE_SCHEDULE count -> linspace
materialization (default.py:119).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import yaml


@dataclass
class DataConfig:
    TRAIN_CLEAN_DIR: str = "data/clean_trainset_28spk_wav"
    TRAIN_NOISY_DIR: str = "data/noisy_trainset_28spk_wav"
    TEST_CLEAN_DIR: str = "data/clean_testset_wav"
    TEST_NOISY_DIR: str = "data/noisy_testset_wav"
    BATCH_SIZE: int = 32


@dataclass
class OptimizerConfig:
    NAME: str = "sgd"


@dataclass
class CriterionConfig:
    NAME: str = "l1"


@dataclass
class SchedulerConfig:
    LR: float = 1e-2
    EPOCHS: int = 100
    CYCLE_LIMIT: int = 4
    WARMUP_EPOCHS: int = 4
    MIN_LR: float = 1e-6


@dataclass
class TrainConfig:
    OPTIMIZER: OptimizerConfig = field(default_factory=OptimizerConfig)
    CRITERION: CriterionConfig = field(default_factory=CriterionConfig)
    SCHEDULER: SchedulerConfig = field(default_factory=SchedulerConfig)


@dataclass
class ModelConfig:
    NAME: str = "diffuse"
    RESUME: str = ""


@dataclass
class Config:
    SAMPLE_RATE: int = 16000
    N_SPECS: int = 201
    N_FFT: int = 400
    HOP_SAMPLES: int = 100
    CROP_FRAMES: int = 160
    RESIDUAL_LAYERS: int = 30
    RESIDUAL_CHANNELS: int = 64
    DILATION_CYCLE_LENGTH: int = 10
    # declared as a step count; materialized to linspace(1e-4, 0.035, N)
    NOISE_SCHEDULE: Any = 50
    INFERENCE_NOISE_SCHEDULE: list = field(
        default_factory=lambda: [0.0001, 0.001, 0.01, 0.05, 0.2, 0.35]
    )
    CROP_LEN: int = 1
    LOSS_WEIGHTS: list = field(default_factory=lambda: [0.1, 0.9, 0.2, 0.05])
    DATA: DataConfig = field(default_factory=DataConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    MODEL: ModelConfig = field(default_factory=ModelConfig)
    OUTPUT: str = ""
    TAG: str = "default"
    RANK: int = 0


def _apply_dict(cfg: Any, values: dict) -> None:
    for key, val in values.items():
        if key == "BASE":
            continue
        if not hasattr(cfg, key):
            raise KeyError(f"unknown config key: {key}")
        cur = getattr(cfg, key)
        if dataclasses.is_dataclass(cur) and isinstance(val, dict):
            _apply_dict(cur, val)
        else:
            setattr(cfg, key, val)


def _load_yaml_with_base(cfg: Config, path: str) -> None:
    with open(path) as f:
        tree = yaml.safe_load(f) or {}
    for base in tree.get("BASE", [""]):
        if base:
            _load_yaml_with_base(cfg, os.path.join(os.path.dirname(path), base))
    _apply_dict(cfg, tree)


def _apply_opts(cfg: Config, opts: list[str] | None) -> None:
    """KEY VALUE pair overrides with dotted paths (e.g. TRAIN.SCHEDULER.LR)."""
    if not opts:
        return
    if len(opts) % 2 != 0:
        raise ValueError("--opts expects KEY VALUE pairs")
    for key, raw in zip(opts[::2], opts[1::2]):
        obj = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        cur = getattr(obj, parts[-1])
        val: Any = raw
        try:
            val = yaml.safe_load(raw)
        except Exception:
            pass
        if isinstance(cur, bool):
            val = bool(val)
        elif isinstance(cur, int) and not isinstance(val, bool):
            val = int(val)
        elif isinstance(cur, float):
            val = float(val)
        setattr(obj, parts[-1], val)


def load_config(
    cfg_file: str | None = None,
    opts: list[str] | None = None,
    **overrides: Any,
) -> Config:
    """Build a config: defaults -> YAML (with BASE inheritance) -> --opts ->
    keyword overrides (the argparse promotion, default.py:94-117)."""
    cfg = Config()
    if cfg_file:
        _load_yaml_with_base(cfg, cfg_file)
    _apply_opts(cfg, opts)
    for key, val in overrides.items():
        if val is None:
            continue
        if key == "batch_size":
            cfg.DATA.BATCH_SIZE = val
        elif key == "arch":
            cfg.MODEL.NAME = val
        elif key == "resume":
            cfg.MODEL.RESUME = val
        elif key == "output":
            cfg.OUTPUT = val
        elif key == "tag":
            cfg.TAG = val
        elif key == "optimizer":
            cfg.TRAIN.OPTIMIZER.NAME = val
        elif key == "lr":
            cfg.TRAIN.SCHEDULER.LR = val
        elif key == "epochs":
            cfg.TRAIN.SCHEDULER.EPOCHS = val
        elif key == "crop_len":
            cfg.CROP_LEN = val
        elif key == "rank":
            cfg.RANK = val
        elif key == "criterion":
            cfg.TRAIN.CRITERION.NAME = val
        else:
            raise KeyError(f"unknown override {key!r}")
    if isinstance(cfg.NOISE_SCHEDULE, int):
        cfg.NOISE_SCHEDULE = np.linspace(1e-4, 0.035, cfg.NOISE_SCHEDULE).tolist()
    cfg.OUTPUT = os.path.join(cfg.OUTPUT, cfg.MODEL.NAME, cfg.TAG)
    return cfg


def get_config(args) -> Config:
    """argparse-namespace entry mirroring config/default.py:128-135."""
    kwargs = {}
    for key in (
        "batch_size", "arch", "resume", "output", "tag", "optimizer", "lr",
        "epochs", "crop_len", "rank", "criterion",
    ):
        if hasattr(args, key) and getattr(args, key):
            kwargs[key] = getattr(args, key)
    return load_config(getattr(args, "cfg", None), getattr(args, "opts", None),
                       **kwargs)
