"""Evaluation loop: batched inference -> KITTI annos -> official AP.

Parity target: /root/reference/tools/eval_utils/eval_utils.py (eval_one_epoch
batch loop + recall bookkeeping:22-105, sec_per_test per-scan latency:53-86,
result.pkl dump:113-114, dataset.evaluation -> AP:116-123).
"""

import pickle
import time

import numpy as np
import tqdm

from hvpr_tpu.models import load_data_to_gpu


def statistics_info(cfg, ret_dict, metric, disp_dict):
    for cur_thresh in cfg['MODEL']['POST_PROCESSING']['RECALL_THRESH_LIST']:
        metric[f'recall_roi_{cur_thresh}'] += int(ret_dict.get(f'roi_{cur_thresh}', 0))
        metric[f'recall_rcnn_{cur_thresh}'] += int(ret_dict.get(f'rcnn_{cur_thresh}', 0))
    metric['gt_num'] += int(ret_dict.get('gt', 0))
    min_thresh = cfg['MODEL']['POST_PROCESSING']['RECALL_THRESH_LIST'][0]
    disp_dict['recall_%s' % str(min_thresh)] = \
        f"{metric[f'recall_roi_{min_thresh}']}/{metric['gt_num']}"


def eval_one_epoch(cfg, model, dataloader, epoch_id, logger, dist_test=False,
                   save_to_file=False, result_dir=None):
    result_dir.mkdir(parents=True, exist_ok=True)
    final_output_dir = result_dir / 'final_result' / 'data'
    if save_to_file:
        final_output_dir.mkdir(parents=True, exist_ok=True)

    metric = {'gt_num': 0}
    for cur_thresh in cfg['MODEL']['POST_PROCESSING']['RECALL_THRESH_LIST']:
        metric[f'recall_roi_{cur_thresh}'] = 0
        metric[f'recall_rcnn_{cur_thresh}'] = 0

    dataset = dataloader.dataset
    class_names = dataset.class_names
    det_annos = []

    logger.info('*************** EPOCH %s EVALUATION *****************', epoch_id)
    progress_bar = tqdm.tqdm(total=len(dataloader), leave=True, desc='eval',
                             dynamic_ncols=True)
    start_time = time.time()
    num_scans = 0
    for i, batch_dict in enumerate(dataloader):
        device_batch = load_data_to_gpu(
            {k: v for k, v in batch_dict.items() if isinstance(v, np.ndarray)})
        if 'gt_boxes' in device_batch and not cfg['MODEL']['POST_PROCESSING'].get(
                'RECALL_THRESH_LIST'):
            device_batch.pop('gt_boxes')
        out = model.eval_forward(device_batch)

        disp_dict = {}
        if 'recall' in out:
            statistics_info(cfg, {k: int(v) for k, v in out['recall'].items()},
                            metric, disp_dict)

        # compact fixed-shape device outputs per sample on host
        boxes = np.asarray(out['pred_boxes'])
        scores = np.asarray(out['pred_scores'])
        labels = np.asarray(out['pred_labels'])
        mask = np.asarray(out['pred_mask'])
        pred_dicts = []
        for b in range(boxes.shape[0]):
            m = mask[b]
            pred_dicts.append({
                'pred_boxes': boxes[b][m],
                'pred_scores': scores[b][m],
                'pred_labels': labels[b][m],
            })
        num_scans += boxes.shape[0]
        capped = int(np.asarray(out.get('num_capped', 0)).sum())
        if capped:
            logger.warning('NMS_POST_MAXSIZE dropped %d surviving boxes '
                           'in this batch', capped)

        annos = dataset.generate_prediction_dicts(
            batch_dict, pred_dicts, class_names,
            output_path=final_output_dir if save_to_file else None)
        det_annos += annos
        progress_bar.set_postfix(disp_dict)
        progress_bar.update()
    progress_bar.close()

    sec_per_example = (time.time() - start_time) / max(len(dataset), 1)
    logger.info('Generate label finished(sec_per_example: %.4f second).', sec_per_example)

    if dist_test:
        from hvpr_tpu.utils.common_utils import merge_results_dist
        # recall counters must gather too (reference eval_utils.py:81-96
        # sums the metric dict across ranks) — each rank saw 1/world of the
        # dataset, so rank 0's local counters alone under-report recall
        world_metrics = merge_results_dist(
            [metric], None, tmpdir=str(result_dir / 'tmpdir'))
        det_annos = merge_results_dist(det_annos, len(dataset),
                                       tmpdir=str(result_dir / 'tmpdir'))
        if det_annos is None:
            return {}
        for part in world_metrics[1:]:
            for key, val in part.items():
                metric[key] += val

    ret_dict = {}
    gt_num_cnt = metric['gt_num']
    for cur_thresh in cfg['MODEL']['POST_PROCESSING']['RECALL_THRESH_LIST']:
        cur_roi_recall = metric[f'recall_roi_{cur_thresh}'] / max(gt_num_cnt, 1)
        cur_rcnn_recall = metric[f'recall_rcnn_{cur_thresh}'] / max(gt_num_cnt, 1)
        logger.info('recall_roi_%s: %f', cur_thresh, cur_roi_recall)
        logger.info('recall_rcnn_%s: %f', cur_thresh, cur_rcnn_recall)
        ret_dict[f'recall/roi_{cur_thresh}'] = cur_roi_recall
        ret_dict[f'recall/rcnn_{cur_thresh}'] = cur_rcnn_recall

    total_pred_objects = sum(len(a['name']) for a in det_annos)
    logger.info('Average predicted number of objects(%d samples): %.3f',
                len(det_annos), total_pred_objects / max(len(det_annos), 1))

    with open(result_dir / 'result.pkl', 'wb') as f:
        pickle.dump(det_annos, f)

    result_str, result_dict = dataset.evaluation(det_annos, class_names)
    if result_str is not None:
        logger.info(result_str)
    ret_dict.update(result_dict)
    logger.info('Result is save to %s', result_dir)
    logger.info('****************Evaluation done.*****************')
    return ret_dict
