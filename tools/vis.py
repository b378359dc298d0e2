"""BEV PNG dump of predictions vs ground truth over a dataloader.

Parity target: /root/reference/tools/vis.py (numba BEV rasterizer:8-61, cv2
box drawing:223-276, dataloader-driven PNG dump:382-425) — rebuilt on the
matplotlib/numpy renderer in visual_utils.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from hvpr_tpu.config import cfg, cfg_from_yaml_file
from hvpr_tpu.datasets import build_dataloader
from hvpr_tpu.models import build_network, load_data_to_gpu
from hvpr_tpu.utils import common_utils
from visual_utils.visual_utils import draw_bev_scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--out_dir', type=str, default='vis_output')
    parser.add_argument('--max_samples', type=int, default=20)
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = common_utils.create_logger()
    test_set, test_loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=1, dist=False, root_path=Path(cfg.DATA_CONFIG.DATA_PATH),
        workers=2, logger=logger, training=False)

    net = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=test_set)
    init_batch = test_set.collate_batch([test_set[0]])
    device_init = load_data_to_gpu(
        {k: v for k, v in init_batch.items() if isinstance(v, np.ndarray)})
    net.init(jax.random.PRNGKey(0), device_init, train=False)
    if args.ckpt:
        from train_utils.train_utils import load_checkpoint
        net.load_state_dict(load_checkpoint(args.ckpt)['model_state'])

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, batch in enumerate(test_loader):
        if i >= args.max_samples:
            break
        device_batch = load_data_to_gpu(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)})
        out = net.eval_forward(device_batch)
        mask = np.asarray(out['pred_mask'][0])
        boxes = np.asarray(out['pred_boxes'][0])[mask]
        gt = batch.get('gt_boxes')
        gt = gt[0] if gt is not None else None
        if gt is not None:
            gt = gt[np.abs(gt).sum(axis=-1) > 0]
        path = draw_bev_scene(
            batch['points'][0], pred_boxes=boxes, gt_boxes=gt,
            save_path=out_dir / f'{batch["frame_id"][0]}.png',
            point_cloud_range=cfg.DATA_CONFIG.POINT_CLOUD_RANGE)
        logger.info('saved %s (%d dets)', path, len(boxes))


if __name__ == '__main__':
    main()
