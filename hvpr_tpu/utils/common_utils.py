"""Common numeric and infrastructure utilities.

Parity target: /root/reference/pcdet/utils/common_utils.py (limit_period:20,
rotate_points_along_z:34-56, mask_points_by_range:59, get_voxel_centers:65-81,
create_logger:84-97, set_random_seed:100-105, distributed helpers:114-195).

Geometry helpers are written array-namespace generically so they work on both
numpy arrays (host data pipeline) and jax arrays (on-device, jit-traceable).
The NCCL process-group machinery of the reference is replaced by JAX process
semantics: see :mod:`hvpr_tpu.parallel` for the mesh/pjit equivalents.
"""

import logging
import os
import random

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover - jax is a hard dep in practice
    jax = None
    jnp = None


def _xp(x):
    """Return the array namespace (numpy or jax.numpy) for ``x``."""
    if jnp is not None and isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray):
        return jnp
    return np


def limit_period(val, offset=0.5, period=np.pi):
    """Limit ``val`` to ``[-offset*period, (1-offset)*period)``."""
    xp = _xp(val)
    return val - xp.floor(val / period + offset) * period


def check_numpy_to_jax(x):
    if isinstance(x, np.ndarray):
        return jnp.asarray(x), True
    return x, False


def rotate_points_along_z(points, angle):
    """Rotate point clouds around the z (up) axis.

    Args:
        points: (B, N, 3 + C) array.
        angle: (B,) rotation angle in rad, counter-clockwise around +z.
    Returns:
        rotated points, same shape/namespace as input.
    """
    xp = _xp(points)
    cosa = xp.cos(angle)
    sina = xp.sin(angle)
    zeros = xp.zeros_like(angle)
    ones = xp.ones_like(angle)
    rot_matrix = xp.stack([
        cosa, sina, zeros,
        -sina, cosa, zeros,
        zeros, zeros, ones,
    ], axis=1).reshape(-1, 3, 3).astype(points.dtype)
    points_rot = xp.matmul(points[:, :, 0:3], rot_matrix)
    points_rot = xp.concatenate([points_rot, points[:, :, 3:]], axis=-1)
    return points_rot


def mask_points_by_range(points, limit_range):
    """Boolean mask of points inside the x/y extent of ``limit_range``."""
    return (
        (points[:, 0] >= limit_range[0]) & (points[:, 0] <= limit_range[3])
        & (points[:, 1] >= limit_range[1]) & (points[:, 1] <= limit_range[4])
    )


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """Voxel-grid coordinates (zyx int) -> metric voxel-center xyz.

    Mirrors reference common_utils.py:65-81.
    """
    assert voxel_coords.shape[1] == 3
    xp = _xp(voxel_coords)
    voxel_centers = voxel_coords[:, [2, 1, 0]].astype(np.float32)  # (xyz)
    voxel_size = xp.asarray(voxel_size, dtype=np.float32) * downsample_times
    pc_range = xp.asarray(point_cloud_range[0:3], dtype=np.float32)
    return (voxel_centers + 0.5) * voxel_size + pc_range


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(f'hvpr_tpu_rank{rank}' if log_file is None else str(log_file))
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    formatter = logging.Formatter('%(asctime)s  %(levelname)5s  %(message)s')
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else logging.ERROR)
        console.setFormatter(formatter)
        logger.addHandler(console)
        if log_file is not None:
            file_handler = logging.FileHandler(log_file)
            file_handler.setLevel(log_level if rank == 0 else logging.ERROR)
            file_handler.setFormatter(formatter)
            logger.addHandler(file_handler)
    return logger


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)
    os.environ['PYTHONHASHSEED'] = str(seed)


def keep_arrays_by_name(gt_names, used_classes):
    inds = [i for i, name in enumerate(gt_names) if name in used_classes]
    return np.array(inds, dtype=np.int64)


def drop_info_with_name(info, name):
    ret_info = {}
    keep_indices = [i for i, x in enumerate(info['name']) if x != name]
    for key in info.keys():
        ret_info[key] = info[key][keep_indices]
    return ret_info


# ---------------------------------------------------------------------------
# Distributed helpers (JAX process model).  The reference uses NCCL process
# groups (common_utils.py:114-171); under JAX the runtime owns collectives and
# a "rank" is a jax process index.
# ---------------------------------------------------------------------------

def get_dist_info():
    """Return (rank, world_size) of the JAX process group (1 process = 1 host)."""
    if jax is None:
        return 0, 1
    try:
        return jax.process_index(), jax.process_count()
    except RuntimeError:
        return 0, 1


def init_dist_jax(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (replacement for init_dist_pytorch/slurm).

    On a single host this is a no-op; on multi-host pods the standard JAX
    environment variables (or explicit arguments) configure the cluster.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return get_dist_info()


def merge_results_dist(result_part, size, tmpdir=None):
    """Gather per-process partial result lists to process 0.

    The reference implements this with a shared-filesystem pickle protocol
    (common_utils.py:174-195).  Under a single JAX process this is an ordered
    truncation; under multi-host it uses the same tmpdir protocol since eval
    results are host-side Python objects.
    """
    rank, world_size = get_dist_info()
    if world_size == 1:
        return result_part[:size]

    import pickle
    import time
    assert tmpdir is not None
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, f'result_part_{rank}.pkl'), 'wb') as f:
        pickle.dump(result_part, f)
    # barrier via sentinel files
    with open(os.path.join(tmpdir, f'done_{rank}'), 'w') as f:
        f.write('1')
    while len([x for x in os.listdir(tmpdir) if x.startswith('done_')]) < world_size:
        time.sleep(0.5)
    if rank != 0:
        return None
    part_list = []
    for i in range(world_size):
        with open(os.path.join(tmpdir, f'result_part_{i}.pkl'), 'rb') as f:
            part_list.append(pickle.load(f))
    ordered_results = []
    for res in zip(*part_list):
        ordered_results.extend(list(res))
    return ordered_results[:size]
