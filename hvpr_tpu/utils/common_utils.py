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


def init_dist_jax(coordinator_address=None, num_processes=None, process_id=None,
                  local_device_ids=None, logger=None):
    """Initialize multi-host JAX (replacement for init_dist_pytorch/slurm,
    reference common_utils.py:114-154).

    Resolution order:
      1. Explicit arguments (``coordinator_address``/``num_processes``/
         ``process_id``) — the ``init_dist_pytorch`` analogue.
      2. Environment: either JAX's own variables
         (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``)
         or a recognized cluster scheduler (SLURM / TPU pod metadata), in
         which case ``jax.distributed.initialize()`` auto-detects — the
         ``init_dist_slurm`` analogue.
      3. Neither found: warn loudly and stay single-process (the reference
         raises in this case; we degrade but never silently).
    """
    if jax.distributed.is_initialized():
        return get_dist_info()

    explicit = num_processes is not None or coordinator_address is not None
    env = os.environ
    env_configured = (
        'JAX_COORDINATOR_ADDRESS' in env or 'COORDINATOR_ADDRESS' in env
        or 'SLURM_JOB_ID' in env or 'TPU_WORKER_HOSTNAMES' in env
        or 'MEGASCALE_COORDINATOR_ADDRESS' in env)

    if explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    elif env_configured:
        jax.distributed.initialize()
    else:
        msg = ('--launcher jax requested but no cluster configuration found '
               '(no coordinator arguments, no JAX_COORDINATOR_ADDRESS/'
               'SLURM/TPU-pod environment); continuing single-process.')
        (logger.warning if logger is not None else
         logging.getLogger(__name__).warning)(msg)
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
    import shutil
    import time
    assert tmpdir is not None
    # Each call gets its own numbered subdirectory (callers invoke this in
    # lockstep, so a per-process counter is globally consistent).  This makes
    # repeated evals in the same tmpdir re-entrant by construction: a rank
    # racing ahead into call N+1 writes into a fresh directory, never one that
    # rank 0 is still gathering from or about to remove.
    call_id = merge_results_dist._calls
    merge_results_dist._calls += 1
    tmpdir = os.path.join(tmpdir, f'merge_{call_id}')
    os.makedirs(tmpdir, exist_ok=True)

    def _wait(predicate, poll=0.05, timeout=600.0):
        deadline = time.monotonic() + timeout
        while not predicate():
            if time.monotonic() > deadline:
                raise TimeoutError(f'merge_results_dist barrier timed out in {tmpdir}')
            time.sleep(poll)

    # Three-phase re-entrant protocol (the reference rmtree's its tmpdir,
    # common_utils.py:174-195; sentinel files must likewise not survive the
    # call or a second eval in the same tmpdir reads stale partials):
    #   1. each rank writes its part, then done_<rank>; all ranks wait for all
    #   2. rank 0 gathers, writes 'gathered'; others wait for it, ack, return
    #   3. rank 0 waits for all acks, then removes the tmpdir entirely
    with open(os.path.join(tmpdir, f'result_part_{rank}.pkl'), 'wb') as f:
        pickle.dump(result_part, f)
    with open(os.path.join(tmpdir, f'done_{rank}'), 'w') as f:
        f.write('1')
    _wait(lambda: all(os.path.exists(os.path.join(tmpdir, f'done_{i}'))
                      for i in range(world_size)))

    if rank != 0:
        _wait(lambda: os.path.exists(os.path.join(tmpdir, 'gathered')))
        with open(os.path.join(tmpdir, f'ack_{rank}'), 'w') as f:
            f.write('1')
        return None

    part_list = []
    for i in range(world_size):
        with open(os.path.join(tmpdir, f'result_part_{i}.pkl'), 'rb') as f:
            part_list.append(pickle.load(f))
    with open(os.path.join(tmpdir, 'gathered'), 'w') as f:
        f.write('1')
    _wait(lambda: all(os.path.exists(os.path.join(tmpdir, f'ack_{i}'))
                      for i in range(1, world_size)))
    shutil.rmtree(tmpdir, ignore_errors=True)

    ordered_results = []
    for res in zip(*part_list):
        ordered_results.extend(list(res))
    return ordered_results[:size]


merge_results_dist._calls = 0
