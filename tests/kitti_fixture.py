"""Shared synthetic mini-KITTI fixture builders."""

import numpy as np
import pytest

np.random.seed(0)

IMG_W, IMG_H = 1242, 375


def make_calib_file(path):
    P2 = np.array([[720.0, 0.0, 620.0, 44.9],
                   [0.0, 720.0, 187.0, 0.1],
                   [0.0, 0.0, 1.0, 0.003]])
    P0 = P2
    R0 = np.eye(3)
    # velodyne -> camera: x_cam = -y_l, y_cam = -z_l, z_cam = x_l
    V2C = np.array([[0.0, -1.0, 0.0, 0.0],
                    [0.0, 0.0, -1.0, 0.08],
                    [1.0, 0.0, 0.0, -0.27]])
    lines = []
    for name, mat in [('P0', P0), ('P1', P0), ('P2', P2), ('P3', P0)]:
        lines.append(f'{name}: ' + ' '.join(f'{v:.12e}' for v in mat.reshape(-1)))
    lines.append('R0_rect: ' + ' '.join(f'{v:.12e}' for v in R0.reshape(-1)))
    lines.append('Tr_velo_to_cam: ' + ' '.join(f'{v:.12e}' for v in V2C.reshape(-1)))
    lines.append('Tr_imu_to_velo: ' + ' '.join(f'{v:.12e}' for v in V2C.reshape(-1)))
    path.write_text('\n'.join(lines) + '\n')


def make_scene(rng, n_cars=49, easy=False):
    """Non-overlapping lidar-frame car boxes on a jittered grid (5x5).

    Enough gts per split (~100) that the 41-point/R40 recall axis fills
    up and perfect predictions actually score ~100 AP.

    ``easy=True`` pins size/z to the Car anchor and headings near the two
    anchor rotations, so a few hundred overfit steps reach sharp 3D@0.7
    localization — needed by delta-bound tests (test_topk_ap_ab) whose
    assertions are meaningless while most boxes sit at marginal IoU.
    """
    xs, ys = np.meshgrid(np.linspace(8, 40, 7), np.linspace(-13.5, 13.5, 7))
    boxes = np.zeros((n_cars, 7), dtype=np.float32)
    boxes[:, 0] = xs.ravel()[:n_cars] + rng.uniform(-0.5, 0.5, n_cars)
    boxes[:, 1] = ys.ravel()[:n_cars] + rng.uniform(-0.5, 0.5, n_cars)
    if easy:
        boxes[:, 2] = -1.0
        boxes[:, 3:6] = [3.9, 1.6, 1.56]  # the hvpr.yaml Car anchor size
        boxes[:, 6] = (rng.choice([0.0, np.pi / 2], n_cars)
                       + rng.uniform(-0.1, 0.1, n_cars))
    else:
        boxes[:, 2] = rng.uniform(-1.2, -0.6, n_cars)  # z center
        boxes[:, 3] = rng.uniform(3.6, 4.3, n_cars)
        boxes[:, 4] = rng.uniform(1.5, 1.8, n_cars)
        boxes[:, 5] = rng.uniform(1.4, 1.7, n_cars)
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_cars)
    return boxes


def lidar_box_to_label_line(box, calib):
    """Build a KITTI label line from a lidar box (inverse of the loader math)."""
    from hvpr_tpu.utils import box_utils
    cam = box_utils.boxes3d_lidar_to_kitti_camera(box[None], calib)[0]
    x, y, z, l, h, w, ry = cam
    img_boxes = box_utils.boxes3d_kitti_camera_to_imageboxes(
        cam[None], calib, image_shape=(IMG_H, IMG_W))[0]
    alpha = -np.arctan2(-box[1], box[0]) + ry
    return ('Car 0.00 0 %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f'
            % (alpha, img_boxes[0], img_boxes[1], img_boxes[2], img_boxes[3],
               h, w, l, x, y, z, ry))




def build_kitti_root(root, n_scenes=4, with_infos=True, easy=False):
    """Create a synthetic KITTI tree with velodyne/calib/label/planes."""
    from hvpr_tpu.utils.calibration_kitti import Calibration
    from PIL import Image
    from pathlib import Path

    root = Path(root)
    training = root / 'training'
    for sub in ['velodyne', 'calib', 'label_2', 'image_2', 'planes']:
        (training / sub).mkdir(parents=True, exist_ok=True)
    (root / 'ImageSets').mkdir(exist_ok=True)

    rng = np.random.default_rng(7)
    ids = [f'{i:06d}' for i in range(n_scenes)]
    scenes = {}
    for sid in ids:
        make_calib_file(training / 'calib' / f'{sid}.txt')
        calib = Calibration(str(training / 'calib' / f'{sid}.txt'))

        boxes = make_scene(rng, easy=easy)
        n_bg = 4000
        pts = np.zeros((n_bg, 4), dtype=np.float32)
        pts[:, 0] = rng.uniform(2, 45, n_bg)
        pts[:, 1] = rng.uniform(-18, 18, n_bg)
        pts[:, 2] = rng.uniform(-1.6, 0.2, n_bg)
        pts[:, 3] = rng.uniform(0, 1, n_bg)
        clusters = []
        for b in boxes:
            n_obj = 200
            local = rng.uniform(-0.4, 0.4, (n_obj, 3)) * b[3:6]
            c, s = np.cos(b[6]), np.sin(b[6])
            world = np.stack([
                local[:, 0] * c - local[:, 1] * s + b[0],
                local[:, 0] * s + local[:, 1] * c + b[1],
                local[:, 2] + b[2],
            ], axis=1)
            clusters.append(np.concatenate(
                [world, rng.uniform(0, 1, (n_obj, 1))], axis=1).astype(np.float32))
        pts = np.concatenate([pts] + clusters, axis=0)
        pts.tofile(training / 'velodyne' / f'{sid}.bin')

        lines = [lidar_box_to_label_line(b, calib) for b in boxes]
        (training / 'label_2' / f'{sid}.txt').write_text('\n'.join(lines) + '\n')
        (training / 'planes' / f'{sid}.txt').write_text(
            '# Plane\nWidth 4\nHeight 1\n0.0 -1.0 0.0 1.68\n')
        Image.new('RGB', (IMG_W, IMG_H)).save(training / 'image_2' / f'{sid}.png')
        scenes[sid] = boxes

    half = max(1, n_scenes // 2)
    (root / 'ImageSets' / 'train.txt').write_text('\n'.join(ids[:half]) + '\n')
    (root / 'ImageSets' / 'val.txt').write_text('\n'.join(ids[half:]) + '\n')
    (root / 'ImageSets' / 'test.txt').write_text('')
    return root, scenes
