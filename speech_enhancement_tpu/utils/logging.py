"""Logger + console meters (re-design of utils/utils.py:19-65 and the
timm AverageMeter usage in core/function.py)."""

from __future__ import annotations

import functools
import logging
import os
import sys
from pathlib import Path


class AverageMeter:
    """Running value/average meter (timm-style, function.py:50-53)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        return f"{self.val:.4f} ({self.avg:.4f})"


class ProgressMeter:
    """Console progress lines (utils/utils.py:19-33)."""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        num_digits = len(str(num_batches))
        self.fmt = "[{:" + str(num_digits) + "d}/" + f"{num_batches}]"
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.fmt.format(batch)]
        entries += [str(m) for m in self.meters]
        print("\t".join(entries))


@functools.lru_cache()
def create_logger(output_dir: str, dist_rank: int = 0, name: str = ""):
    """Per-rank file handler + rank-0 console (utils/utils.py:36-65)."""
    Path(output_dir).mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    fmt = "[%(asctime)s %(name)s] (%(filename)s %(lineno)d): %(levelname)s %(message)s"
    if dist_rank == 0:
        console = logging.StreamHandler(sys.stdout)
        console.setLevel(logging.DEBUG)
        console.setFormatter(logging.Formatter(fmt=fmt, datefmt="%Y-%m-%d %H:%M:%S"))
        logger.addHandler(console)
    fh = logging.FileHandler(
        os.path.join(output_dir, f"log_rank{dist_rank}.txt"), mode="a"
    )
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(logging.Formatter(fmt=fmt, datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(fh)
    return logger
