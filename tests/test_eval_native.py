"""Native C++ KITTI matching kernel vs the pure-Python semantics oracle."""

import numpy as np
import pytest

from hvpr_tpu.datasets.kitti.kitti_object_eval_python import eval as kitti_eval
from hvpr_tpu.native import geometry as native_geometry


@pytest.mark.skipif(not native_geometry.available(), reason='no native lib')
def test_native_matching_matches_python():
    rng = np.random.default_rng(11)
    for trial in range(30):
        num_gt = int(rng.integers(1, 12))
        num_dt = int(rng.integers(1, 20))
        overlaps = rng.uniform(0, 1, (num_dt, num_gt))
        gt_datas = np.zeros((num_gt, 5))
        gt_datas[:, 4] = rng.uniform(-np.pi, np.pi, num_gt)
        dt_datas = np.zeros((num_dt, 6))
        dt_datas[:, 4] = rng.uniform(-np.pi, np.pi, num_dt)
        dt_datas[:, 5] = rng.uniform(0, 1, num_dt)
        ignored_gt = rng.choice([-1, 0, 1], num_gt, p=[0.2, 0.6, 0.2]).tolist()
        ignored_det = rng.choice([-1, 0, 1], num_dt, p=[0.2, 0.6, 0.2]).tolist()

        for compute_fp in (False, True):
            for thresh in (0.0, 0.5):
                want = kitti_eval._compute_statistics_py(
                    overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                    [], metric=2, min_overlap=0.5, thresh=thresh,
                    compute_fp=compute_fp, compute_aos=True)
                got = native_geometry.kitti_compute_statistics(
                    overlaps, gt_datas[:, 4], dt_datas[:, 4], dt_datas[:, 5],
                    ignored_gt, ignored_det, 0.5, thresh, compute_fp, True)
                assert want[0] == got[0], (trial, 'tp')
                assert want[1] == got[1], (trial, 'fp')
                assert want[2] == got[2], (trial, 'fn')
                np.testing.assert_allclose(want[3], got[3], atol=1e-9)
                np.testing.assert_allclose(sorted(want[4]), sorted(got[4]), atol=1e-12)
