"""Single-scan inference demo.

Parity target: /root/reference/tools/demo.py (DemoDataset over raw .bin/.npy
files:16-53, single-sample collate -> forward -> visualization:86-97). The
mayavi 3D viewer of the reference is optional; results print to stdout and a
BEV PNG can be dumped with --save_bev (matplotlib).
"""

import argparse
import glob
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from hvpr_tpu.config import cfg, cfg_from_yaml_file
from hvpr_tpu.datasets import DatasetTemplate
from hvpr_tpu.models import build_network, load_data_to_gpu
from hvpr_tpu.utils import common_utils


class DemoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=False, root_path=None,
                 logger=None, ext='.bin'):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.root_path = root_path
        self.ext = ext
        data_file_list = glob.glob(str(root_path / f'*{self.ext}')) \
            if root_path.is_dir() else [str(root_path)]
        data_file_list.sort()
        self.sample_file_list = data_file_list

    def __len__(self):
        return len(self.sample_file_list)

    def __getitem__(self, index):
        if self.ext == '.bin':
            points = np.fromfile(self.sample_file_list[index],
                                 dtype=np.float32).reshape(-1, 4)
        elif self.ext == '.npy':
            points = np.load(self.sample_file_list[index])
        else:
            raise NotImplementedError(self.ext)

        input_dict = {'points': points, 'frame_id': index}
        data_dict = self.prepare_data(data_dict=input_dict)
        return data_dict


def parse_config():
    parser = argparse.ArgumentParser(description='hvpr_tpu demo')
    parser.add_argument('--cfg_file', type=str,
                        default='cfgs/kitti_models/hvpr.yaml')
    parser.add_argument('--data_path', type=str, default='demo_data',
                        help='point cloud file or directory')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--ext', type=str, default='.bin')
    parser.add_argument('--save_bev', type=str, default=None,
                        help='directory to dump BEV visualizations')
    parser.add_argument('--save_3d', type=str, default=None,
                        help='directory to dump 3D scene renders (.png + .ply)')
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    return args, cfg


def main():
    args, cfg_ = parse_config()
    logger = common_utils.create_logger()
    logger.info('-----------------Demo of hvpr_tpu-------------------------')
    demo_dataset = DemoDataset(
        dataset_cfg=cfg_.DATA_CONFIG, class_names=cfg_.CLASS_NAMES, training=False,
        root_path=Path(args.data_path), ext=args.ext, logger=logger)
    logger.info('Total number of samples: \t%d', len(demo_dataset))

    net = build_network(cfg_.MODEL, num_class=len(cfg_.CLASS_NAMES),
                        dataset=demo_dataset)
    init_batch = demo_dataset.collate_batch([demo_dataset[0]])
    device_init = load_data_to_gpu(
        {k: v for k, v in init_batch.items() if isinstance(v, np.ndarray)})
    net.init(jax.random.PRNGKey(0), device_init, train=False)

    if args.ckpt is not None:
        from train_utils.train_utils import load_checkpoint
        payload = load_checkpoint(args.ckpt)
        net.load_state_dict(payload['model_state'])
        logger.info('Loaded checkpoint %s', args.ckpt)

    for idx in range(len(demo_dataset)):
        data_dict = demo_dataset.collate_batch([demo_dataset[idx]])
        device_batch = load_data_to_gpu(
            {k: v for k, v in data_dict.items() if isinstance(v, np.ndarray)})
        out = net.eval_forward(device_batch)
        mask = np.asarray(out['pred_mask'][0])
        boxes = np.asarray(out['pred_boxes'][0])[mask]
        scores = np.asarray(out['pred_scores'][0])[mask]
        labels = np.asarray(out['pred_labels'][0])[mask]
        logger.info('sample %d: %d detections', idx, len(boxes))
        for b, s, l in zip(boxes[:10], scores[:10], labels[:10]):
            logger.info('  cls=%d score=%.3f box=[% .2f % .2f % .2f %.2f %.2f %.2f % .2f]',
                        int(l), float(s), *b)

        if args.save_bev:
            from visual_utils.visual_utils import draw_bev_scene
            out_dir = Path(args.save_bev)
            out_dir.mkdir(parents=True, exist_ok=True)
            draw_bev_scene(
                np.asarray(data_dict['points'][0]), boxes,
                save_path=out_dir / f'demo_{idx:04d}.png',
                point_cloud_range=cfg_.DATA_CONFIG.POINT_CLOUD_RANGE)

        if args.save_3d:
            # 3D scene render + .ply export (mayavi draw_scenes replacement,
            # reference visual_utils.py:142-215)
            from visual_utils.visual_utils import draw_scenes, export_scene_ply
            out_dir = Path(args.save_3d)
            out_dir.mkdir(parents=True, exist_ok=True)
            pts = np.asarray(data_dict['points'][0])
            pts = pts[np.asarray(data_dict['point_valid_mask'][0])] \
                if 'point_valid_mask' in data_dict else pts
            draw_scenes(pts, ref_boxes=boxes,
                        save_path=out_dir / f'demo_{idx:04d}_3d.png')
            export_scene_ply(pts, boxes,
                             save_path=str(out_dir / f'demo_{idx:04d}.ply'))
    logger.info('Demo done.')


if __name__ == '__main__':
    main()
