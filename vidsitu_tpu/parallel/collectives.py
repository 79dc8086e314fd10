"""Process-level helpers mirroring the reference's rank utilities
(utils/trn_utils.py:44-129) in TPU-native form.

Inside a pjit-ed step, gradient/loss reduction is implicit from
shardings; these helpers cover the *host-side* coordination the
reference does with torch.distributed.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize(name: str = "barrier"):
    """Cross-host barrier (reference synchronize, trn_utils.py:64-76)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def reduce_dict(input_dict: Dict[str, float], average: bool = True) -> Dict:
    """All-reduce a dict of host scalars across processes
    (reference reduce_dict, trn_utils.py:79-103)."""
    if jax.process_count() == 1:
        return dict(input_dict)
    from jax.experimental import multihost_utils

    keys = sorted(input_dict.keys())
    vec = np.asarray([float(input_dict[k]) for k in keys], np.float64)
    summed = np.asarray(
        multihost_utils.process_allgather(vec), np.float64
    ).sum(axis=0)
    if average:
        summed = summed / jax.process_count()
    return {k: float(v) for k, v in zip(keys, summed)}


def reduce_dict_corr(input_dict: Dict[str, float], nums: float) -> Dict:
    """Count-weighted variant (reference reduce_dict_corr,
    trn_utils.py:106-121)."""
    if jax.process_count() == 1:
        return dict(input_dict)
    from jax.experimental import multihost_utils

    keys = sorted(input_dict.keys())
    vec = np.asarray(
        [float(input_dict[k]) * nums for k in keys] + [float(nums)],
        np.float64,
    )
    summed = np.asarray(
        multihost_utils.process_allgather(vec), np.float64
    ).sum(axis=0)
    total = summed[-1]
    return {k: float(v / max(total, 1e-8)) for k, v in zip(keys, summed[:-1])}
