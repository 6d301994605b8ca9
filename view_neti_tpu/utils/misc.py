"""Small host-side helpers (seeding, path filtering, checksums).

Parity with /root/reference/utils/utils.py:27-37 and utils/fixseed.py:6-10.
"""
from __future__ import annotations

import random
from pathlib import Path
from typing import Iterable, List

import numpy as np
import jax


def fixseed(seed: int) -> None:
    """Seed host-side RNGs. Device randomness is explicit via jax.random keys
    threaded through the train/inference steps, so there is no global device
    RNG to seed (unlike the reference's torch/cudnn seeding)."""
    random.seed(seed)
    np.random.seed(seed)


def filter_paths_imgs(paths: Iterable[Path]) -> List[Path]:
    """Keep only .png / .jpg files."""
    return [p for p in paths if Path(p).suffix in ('.png', '.jpg')]


def parameters_checksum(params) -> float:
    """Sum of absolute values over a parameter pytree (debug aid)."""
    if params is None:
        return 0.0
    leaves = jax.tree_util.tree_leaves(params)
    return float(sum(abs(np.asarray(l)).sum() for l in leaves))
