"""NuScenes dataset: multi-sweep LiDAR aggregation + balanced resampling.

Parity target: the reference registers ``NuScenesDataset``
(/root/reference/pcdet/datasets/__init__.py:9,14) but the snapshot omits its
source (SURVEY.md §0), so this module implements the upstream OpenPCDet-v0.3
capability surface from its documented semantics, host-side and TPU-first:

- pickled info lists per split (``nuscenes_infos_<N>sweeps_<split>.pkl``),
  schema documented on :meth:`NuScenesDataset.include_nuscenes_data`;
- multi-sweep point aggregation: past sweeps are ego-motion-compensated into
  the reference frame via stored 4x4 transforms and tagged with a time-lag
  channel (the 5th point feature);
- class-balanced info resampling for the long-tailed nuScenes label
  distribution (train only, ``BALANCED_RESAMPLING``);
- prediction output in the nuScenes submission format (global-frame boxes as
  translation/size/yaw-quaternion dicts keyed by sample token) — pure numpy,
  no devkit required because the infos carry the lidar->global transform;
- evaluation: official nuscenes-devkit evaluator when the package exists,
  otherwise an in-tree center-distance AP (the nuScenes matching rule:
  BEV center distance <= {0.5, 1, 2, 4} m) so progress is measurable in
  devkit-free environments.

Offline info creation (:func:`create_nuscenes_infos`) requires the
``nuscenes`` devkit and raises a clear error without it; everything else in
this module runs from the pickles alone.
"""

import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


def _yaw_to_quaternion(yaw):
    """(w, x, y, z) quaternion for a rotation of ``yaw`` around +z."""
    return [float(np.cos(yaw / 2.0)), 0.0, 0.0, float(np.sin(yaw / 2.0))]


def transform_points(points_xyz, tm):
    """Apply a 4x4 homogeneous transform to (N, 3) points."""
    return points_xyz @ tm[:3, :3].T + tm[:3, 3]


def boxes_lidar_to_global(boxes7, ref_to_global):
    """Transform (N, 7) lidar-frame boxes by a 4x4 lidar->global matrix.

    Only z-rotations appear in practice for the BEV box parametrization; the
    heading is advanced by the transform's yaw component.
    """
    boxes7 = np.asarray(boxes7, np.float32).reshape(-1, 7)
    centers = transform_points(boxes7[:, :3], ref_to_global)
    yaw_tm = np.arctan2(ref_to_global[1, 0], ref_to_global[0, 0])
    out = boxes7.copy()
    out[:, :3] = centers
    out[:, 6] = boxes7[:, 6] + yaw_tm
    return out


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        root_path = (Path(root_path) if root_path is not None
                     else Path(dataset_cfg['DATA_PATH'])) / \
            dataset_cfg.get('VERSION', 'v1.0-trainval')
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.infos = []
        self.include_nuscenes_data(self.mode)
        if self.training and self.dataset_cfg.get('BALANCED_RESAMPLING', False):
            self.infos = self.balanced_infos_resampling(self.infos)

    # ------------------------------------------------------------------ infos

    def include_nuscenes_data(self, mode):
        """Load the pickled info lists for ``mode``.

        Info schema (one dict per sample):
          lidar_path      str, relative to the version root
          token           str, nuScenes sample token
          timestamp       float, seconds
          ref_to_global   (4, 4) float, lidar->global (identity if absent)
          sweeps          list of {lidar_path, transform_matrix (4,4),
                          time_lag (s)} for preceding sweeps, newest first
          gt_boxes        (N, 7[+2]) float lidar-frame boxes (+velocity cols)
          gt_names        (N,) str
          num_lidar_pts   (N,) int (optional; enables min-points filtering)
        """
        if self.logger is not None:
            self.logger.info('Loading NuScenes dataset')
        nuscenes_infos = []
        for info_path in self.dataset_cfg['INFO_PATH'][mode]:
            info_path = self.root_path / info_path
            if not info_path.exists():
                continue
            with open(info_path, 'rb') as f:
                nuscenes_infos.extend(pickle.load(f))
        self.infos.extend(nuscenes_infos)
        if self.logger is not None:
            self.logger.info(
                f'Total samples for NuScenes dataset: {len(nuscenes_infos)}')

    def balanced_infos_resampling(self, infos):
        """Resample so every class contributes an equal info fraction.

        Long-tail correction: each info is bucketed under every class it
        contains; each bucket is then sampled (with replacement) down/up to
        ``len(infos) / num_classes`` entries and the buckets concatenated.
        """
        if self.class_names is None:
            return infos
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info['gt_names']) & set(self.class_names):
                cls_infos[name].append(info)

        duplicated_samples = sum(len(v) for v in cls_infos.values())
        if duplicated_samples == 0:
            return infos
        frac = 1.0 / len(self.class_names)
        sampled_infos = []
        for infos_of_cls in cls_infos.values():
            if len(infos_of_cls) == 0:
                continue
            ratio = frac * duplicated_samples / len(infos_of_cls)
            target = int(len(infos_of_cls) * ratio)
            idx = np.random.choice(len(infos_of_cls), target, replace=True)
            sampled_infos.extend([infos_of_cls[i] for i in idx])
        if self.logger is not None:
            self.logger.info(
                f'Total samples after balanced resampling: {len(sampled_infos)}')
        return sampled_infos

    # ------------------------------------------------------------------ points

    def _load_points(self, lidar_file):
        """Raw nuScenes .bin: (N, 5) float32 rows [x y z intensity ring]."""
        points = np.fromfile(str(lidar_file), dtype=np.float32)
        return points.reshape(-1, 5)[:, :4]

    @staticmethod
    def remove_ego_points(points, center_radius=1.0):
        mask = ~((np.abs(points[:, 0]) < center_radius)
                 & (np.abs(points[:, 1]) < center_radius))
        return points[mask]

    def get_sweep(self, sweep_info):
        """One past sweep, ego-motion-compensated into the reference frame."""
        points = self._load_points(self.root_path / sweep_info['lidar_path'])
        points = self.remove_ego_points(points)
        tm = np.asarray(sweep_info['transform_matrix'], np.float32)
        points[:, :3] = transform_points(points[:, :3], tm)
        times = sweep_info['time_lag'] * np.ones((points.shape[0], 1), np.float32)
        return points, times

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        """Reference cloud + up to ``max_sweeps - 1`` compensated past sweeps.

        Returns (N, 5) [x y z intensity time_lag]; the reference sweep has
        time_lag 0. Sweep choice is random in training (augmentation), the
        newest sweeps first in eval (deterministic).
        """
        info = self.infos[index]
        points = self.remove_ego_points(
            self._load_points(self.root_path / info['lidar_path']))
        sweep_points = [points]
        sweep_times = [np.zeros((points.shape[0], 1), np.float32)]

        sweeps = info.get('sweeps', [])
        k = min(max_sweeps - 1, len(sweeps))
        if k > 0:
            if self.training:
                chosen = np.random.choice(len(sweeps), k, replace=False)
            else:
                chosen = np.arange(k)
            for i in chosen:
                pts, times = self.get_sweep(sweeps[i])
                sweep_points.append(pts)
                sweep_times.append(times)

        points = np.concatenate(sweep_points, axis=0)
        times = np.concatenate(sweep_times, axis=0)
        return np.concatenate([points, times], axis=1).astype(np.float32)

    # ------------------------------------------------------------------ items

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = self.infos[index]
        points = self.get_lidar_with_sweeps(
            index, max_sweeps=int(self.dataset_cfg.get('MAX_SWEEPS', 1)))

        input_dict = {
            'points': points,
            'frame_id': Path(info['lidar_path']).stem,
            'metadata': {'token': info['token']},
        }
        if 'gt_boxes' in info:
            gt_boxes = np.asarray(info['gt_boxes'], np.float32)
            gt_names = np.asarray(info['gt_names'])
            min_pts = self.dataset_cfg.get('FILTER_MIN_POINTS_IN_GT', 0)
            if min_pts > 0 and 'num_lidar_pts' in info:
                mask = np.asarray(info['num_lidar_pts']) >= min_pts
                gt_boxes, gt_names = gt_boxes[mask], gt_names[mask]
            input_dict['gt_boxes'] = gt_boxes[:, :7]
            input_dict['gt_names'] = gt_names

        data_dict = self.prepare_data(data_dict=input_dict)
        return data_dict

    # ------------------------------------------------------------- prediction

    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        """Per-frame anno dicts (+ optional nuScenes submission json).

        Same row schema as the KITTI path (`name`, `score`, `boxes_lidar`,
        `pred_labels`) plus `metadata.token` so results key back to samples.
        With ``output_path`` (tools/test.py --save_to_file), each frame's
        global-frame submission rows are written as ``<token>.json`` —
        the nuScenes analogue of the KITTI per-frame label txt.
        """
        annos = []
        for index, box_dict in enumerate(pred_dicts):
            scores = np.asarray(box_dict['pred_scores'])
            boxes = np.asarray(box_dict['pred_boxes'])
            labels = np.asarray(box_dict['pred_labels'])
            n = len(scores)
            anno = {
                'name': np.array([class_names[int(l) - 1] for l in labels])
                        if n else np.zeros(0, dtype='<U32'),
                'score': scores,
                'boxes_lidar': boxes,
                'pred_labels': labels,
            }
            meta = batch_dict.get('metadata', None)
            if meta is not None:
                anno['metadata'] = meta[index]
            annos.append(anno)

        if output_path is not None:
            import json
            results = self.annos_to_nusc_results(
                [a for a in annos if 'metadata' in a])
            for token, frame in results.items():
                with open(Path(output_path) / f'{token}.json', 'w') as f:
                    json.dump(frame, f)
        return annos

    def annos_to_nusc_results(self, det_annos):
        """Convert accumulated annos to the nuScenes submission `results` map.

        token -> list of {translation, size, rotation, velocity,
        detection_name, detection_score, attribute_name}; boxes are moved to
        the global frame with the info-stored lidar->global transform.
        """
        # built once: generate_prediction_dicts calls this per BATCH under
        # --save_to_file, and rebuilding a dataset-sized dict each call is
        # O(N^2/batch) overhead over an eval epoch
        tm_by_token = getattr(self, '_tm_by_token', None)
        if tm_by_token is None:
            tm_by_token = {
                info['token']: np.asarray(
                    info.get('ref_to_global', np.eye(4)), np.float32)
                for info in self.infos}
            self._tm_by_token = tm_by_token
        results = {}
        for anno in det_annos:
            token = anno.get('metadata', {}).get('token')
            if token is None:
                continue
            tm = tm_by_token.get(token, np.eye(4, dtype=np.float32))
            boxes_global = boxes_lidar_to_global(
                anno['boxes_lidar'][:, :7], tm)
            frame = []
            for i in range(len(boxes_global)):
                b = boxes_global[i]
                frame.append({
                    'sample_token': token,
                    'translation': b[:3].tolist(),
                    # nuScenes size order is (w, l, h); lidar boxes are (l, w, h)
                    'size': [float(b[4]), float(b[3]), float(b[5])],
                    'rotation': _yaw_to_quaternion(float(b[6])),
                    'velocity': [0.0, 0.0],
                    'detection_name': str(anno['name'][i]),
                    'detection_score': float(anno['score'][i]),
                    'attribute_name': '',
                })
            results[token] = frame
        return results

    # ------------------------------------------------------------- evaluation

    def evaluation(self, det_annos, class_names, **kwargs):
        try:
            import nuscenes  # noqa: F401
            have_devkit = True
        except ImportError:
            have_devkit = False
        if have_devkit:
            return self._evaluation_devkit(det_annos, class_names, **kwargs)
        result_str, result_dict = self._evaluation_center_distance(
            det_annos, class_names)
        result_str = ('nuscenes-devkit not installed: reporting in-tree '
                      'center-distance AP (official matching rule, '
                      'AP-only)\n' + result_str)
        return result_str, result_dict

    def _evaluation_devkit(self, det_annos, class_names, **kwargs):
        """Official evaluator (requires the nuscenes devkit + raw dataset)."""
        import json
        import tempfile
        from nuscenes import NuScenes
        from nuscenes.eval.detection.config import config_factory
        from nuscenes.eval.detection.evaluate import NuScenesEval

        # root_path IS the devkit dataroot: the table dir (v1.0-*/ with the
        # json tables) lives directly under it, matching create_nuscenes_infos
        nusc = NuScenes(version=self.dataset_cfg['VERSION'],
                        dataroot=str(self.root_path), verbose=False)
        results = {
            'results': self.annos_to_nusc_results(det_annos),
            'meta': {'use_camera': False, 'use_lidar': True,
                     'use_radar': False, 'use_map': False,
                     'use_external': False},
        }
        with tempfile.TemporaryDirectory() as tmpdir:
            res_path = Path(tmpdir) / 'results_nusc.json'
            with open(res_path, 'w') as f:
                json.dump(results, f)
            eval_set = {'v1.0-trainval': 'val', 'v1.0-mini': 'mini_val',
                        'v1.0-test': 'test'}[self.dataset_cfg['VERSION']]
            nusc_eval = NuScenesEval(
                nusc, config=config_factory('detection_cvpr_2019'),
                result_path=str(res_path), eval_set=eval_set,
                output_dir=tmpdir, verbose=False)
            metrics = nusc_eval.main(plot_examples=0, render_curves=False)
        result_dict = {f'{k}/mAP': v for k, v in
                       metrics['mean_dist_aps'].items()}
        result_dict['NDS'] = metrics['nd_score']
        result_str = '\n'.join(f'{k}: {v:.4f}' for k, v in result_dict.items())
        return result_str, result_dict

    def _evaluation_center_distance(self, det_annos, class_names,
                                    dist_thresholds=(0.5, 1.0, 2.0, 4.0)):
        """Devkit-free AP under the official nuScenes matching rule.

        A detection matches an unclaimed same-class gt when their BEV center
        distance is <= threshold; AP is the normalized area under the
        precision-recall curve for recall/precision > 0.1 (the official
        clipping), averaged over the four distance thresholds.
        """
        gt_by_token = {}
        for info in self.infos:
            boxes = np.asarray(info.get('gt_boxes',
                                        np.zeros((0, 7))), np.float32)
            names = np.asarray(info.get('gt_names', np.zeros(0, dtype='<U32')))
            gt_by_token[info['token']] = (boxes, names)

        result_dict = {}
        for cls in class_names:
            aps = []
            for thr in dist_thresholds:
                scores, matched, n_gt = [], [], 0
                for anno in det_annos:
                    token = anno.get('metadata', {}).get('token')
                    gt_boxes, gt_names = gt_by_token.get(
                        token, (np.zeros((0, 7), np.float32),
                                np.zeros(0, dtype='<U32')))
                    gt_sel = gt_boxes[gt_names == cls]
                    n_gt += len(gt_sel)
                    det_mask = anno['name'] == cls
                    det_boxes = anno['boxes_lidar'][det_mask]
                    det_scores = anno['score'][det_mask]
                    order = np.argsort(-det_scores)
                    claimed = np.zeros(len(gt_sel), bool)
                    for di in order:
                        scores.append(det_scores[di])
                        if len(gt_sel) == 0:
                            matched.append(False)
                            continue
                        d = np.linalg.norm(
                            gt_sel[:, :2] - det_boxes[di, :2], axis=1)
                        d = np.where(claimed, np.inf, d)
                        j = int(np.argmin(d))
                        if d[j] <= thr:
                            claimed[j] = True
                            matched.append(True)
                        else:
                            matched.append(False)
                if n_gt == 0 or len(scores) == 0:
                    aps.append(0.0)
                    continue
                order = np.argsort(-np.asarray(scores))
                matched_sorted = np.asarray(matched)[order]
                tp = np.cumsum(matched_sorted)
                fp = np.cumsum(~matched_sorted)
                recall = tp / n_gt
                precision = tp / np.maximum(tp + fp, 1)
                # official 101-point interpolation; the devkit averages
                # indices 11..100 (prec[round(100*min_recall)+1:] — the
                # recall==0.1 point itself is EXCLUDED)
                rec_interp = np.linspace(0, 1, 101)
                prec_interp = np.interp(rec_interp, recall, precision,
                                        right=0.0)
                prec_clip = np.maximum(prec_interp[11:] - 0.1, 0.0) / 0.9
                aps.append(float(np.mean(prec_clip)))
            result_dict[f'{cls}/mAP'] = float(np.mean(aps))
        result_dict['mAP'] = float(np.mean(list(result_dict.values()))) \
            if result_dict else 0.0
        result_str = '\n'.join(f'{k}: {v:.4f}' for k, v in result_dict.items())
        return result_str, result_dict


def create_nuscenes_infos(version, data_path, save_path, max_sweeps=10):
    """Offline info builder: raw nuScenes database -> split info pickles.

    The database walk needs the nuscenes devkit; all geometry (pose
    composition, sweep transforms, global->lidar boxes) lives devkit-free and
    unit-tested in :mod:`.nuscenes_utils`.
    """
    try:
        from nuscenes import NuScenes
        from nuscenes.utils import splits
    except ImportError as e:
        raise ImportError(
            'create_nuscenes_infos requires the nuscenes devkit '
            '(pip install nuscenes-devkit); the runtime dataset only needs '
            'the pickles it produces.') from e
    from .nuscenes_utils import fill_infos

    nusc = NuScenes(version=version, dataroot=str(data_path), verbose=True)
    split_names = {
        'v1.0-trainval': (splits.train, splits.val),
        'v1.0-test': (splits.test, []),
        'v1.0-mini': (splits.mini_train, splits.mini_val),
    }[version]
    scene_to_split = {}
    for scene in nusc.scene:
        if scene['name'] in split_names[0]:
            scene_to_split[scene['token']] = 0
        elif scene['name'] in split_names[1]:
            scene_to_split[scene['token']] = 1
    tokens = ([], [])
    for sample in nusc.sample:
        split = scene_to_split.get(sample['scene_token'])
        if split is not None:
            tokens[split].append(sample['token'])

    save_path = Path(save_path)
    # the first token bucket is the eval split itself for the test version
    # (splits.test occupies slot 0 and there is no slot-1 split)
    split_names_out = (('test', None) if version == 'v1.0-test'
                       else ('train', 'val'))
    for split, name in enumerate(split_names_out):
        if name is None or not tokens[split]:
            continue
        infos = fill_infos(nusc, tokens[split], max_sweeps=max_sweeps)
        out = save_path / f'nuscenes_infos_{max_sweeps}sweeps_{name}.pkl'
        with open(out, 'wb') as f:
            pickle.dump(infos, f)
        print(f'{name}: {len(infos)} infos -> {out}')


if __name__ == '__main__':
    import sys
    import yaml
    from ...config import ConfigDict

    if len(sys.argv) > 1 and sys.argv[1] == 'create_nuscenes_infos':
        dataset_cfg = ConfigDict(yaml.safe_load(open(sys.argv[2])))
        ROOT_DIR = Path(__file__).resolve().parent.parent.parent.parent
        create_nuscenes_infos(
            version=dataset_cfg.get('VERSION', 'v1.0-trainval'),
            data_path=ROOT_DIR / 'data' / 'nuscenes' /
            dataset_cfg.get('VERSION', 'v1.0-trainval'),
            save_path=ROOT_DIR / 'data' / 'nuscenes' /
            dataset_cfg.get('VERSION', 'v1.0-trainval'),
            max_sweeps=int(dataset_cfg.get('MAX_SWEEPS', 10)))
