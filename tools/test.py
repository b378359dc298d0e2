"""Evaluation CLI.

Parity target: /root/reference/tools/test.py (argparse:20-52, eval_single_ckpt
:55-64, repeat_eval_ckpt ckpt-dir watcher with record-file dedup + 30s poll +
timeout:67-131, dist eval:134-195).
"""

import argparse
import datetime
import glob
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from hvpr_tpu.config import (cfg, cfg_from_list, cfg_from_yaml_file,
                             log_config_to_file)
from hvpr_tpu.datasets import build_dataloader
from hvpr_tpu.models import build_network
from hvpr_tpu.utils import common_utils
from eval_utils import eval_utils
from train_utils.train_utils import load_checkpoint


def parse_config():
    parser = argparse.ArgumentParser(description='hvpr_tpu evaluation')
    parser.add_argument('--cfg_file', type=str, default=None)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--launcher', choices=['none', 'jax'], default='none')
    parser.add_argument('--coordinator_address', type=str, default=None,
                        help='multi-host: host:port of process 0 (env auto-detect if unset)')
    parser.add_argument('--num_processes', type=int, default=None)
    parser.add_argument('--process_id', type=int, default=None)
    parser.add_argument('--eval_tag', type=str, default='default')
    parser.add_argument('--eval_all', action='store_true', default=False,
                        help='evaluate all checkpoints in ckpt_dir')
    parser.add_argument('--ckpt_dir', type=str, default=None)
    parser.add_argument('--save_to_file', action='store_true', default=False)
    parser.add_argument('--max_waiting_mins', type=int, default=30)
    parser.add_argument('--start_epoch', type=int, default=0)
    parser.add_argument('--set', dest='set_cfgs', default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = '/'.join(args.cfg_file.split('/')[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def load_params_into_network(net, ckpt_path, logger):
    if str(ckpt_path).endswith('.pth'):
        # torch reference checkpoint (name-mapped + layout-transformed)
        from hvpr_tpu.utils.torch_ckpt import load_pth_into_variables
        net.variables, report = load_pth_into_variables(
            str(ckpt_path), net.variables, logger=logger)
        if report['mismatched']:
            logger.info('Skipped (shape-mismatched) keys: %s',
                        report['mismatched'])
        logger.info('Loaded torch checkpoint %s', ckpt_path)
        import re as _re
        m = _re.search(r'checkpoint_epoch_(\d+)', str(ckpt_path))
        return m.group(1) if m else 'no_number'
    payload = load_checkpoint(ckpt_path)
    skipped = net.load_state_dict(payload['model_state'])
    if skipped:
        logger.info('Skipped (shape-mismatched) keys: %s', skipped)
    logger.info('Loaded checkpoint %s (epoch %s)', ckpt_path, payload.get('epoch'))
    return payload.get('epoch', 'no_number')


def eval_single_ckpt(net, test_loader, args, eval_output_dir, logger, epoch_id,
                     dist_test=False):
    eval_utils.eval_one_epoch(
        cfg, net, test_loader, epoch_id, logger, dist_test=dist_test,
        result_dir=eval_output_dir, save_to_file=args.save_to_file)


def get_no_evaluated_ckpt(ckpt_dir, ckpt_record_file, args):
    ckpt_list = glob.glob(os.path.join(ckpt_dir, 'checkpoint_epoch_*.msgpack'))
    ckpt_list.sort(key=os.path.getmtime)
    evaluated_ckpt_list = [float(x.strip()) for x in open(ckpt_record_file, 'r').readlines()]

    for cur_ckpt in ckpt_list:
        num_list = re.findall('checkpoint_epoch_(.*).msgpack', cur_ckpt)
        if not num_list:
            continue
        epoch_id = num_list[-1]
        if float(epoch_id) not in evaluated_ckpt_list and int(float(epoch_id)) >= args.start_epoch:
            return epoch_id, cur_ckpt
    return -1, None


def repeat_eval_ckpt(net, test_loader, args, eval_output_dir, logger, ckpt_dir,
                     dist_test=False):
    ckpt_record_file = eval_output_dir / ('eval_list_%s.txt' % cfg.DATA_CONFIG.DATA_SPLIT['test'])
    with open(ckpt_record_file, 'a'):
        pass
    tb_log = None
    if jax.process_index() == 0:
        from torch.utils.tensorboard import SummaryWriter
        tb_log = SummaryWriter(log_dir=str(eval_output_dir / 'tensorboard'))

    total_time = 0
    first_eval = True
    while True:
        cur_epoch_id, cur_ckpt = get_no_evaluated_ckpt(ckpt_dir, ckpt_record_file, args)
        if cur_epoch_id == -1 or int(float(cur_epoch_id)) < args.start_epoch:
            if args.max_waiting_mins <= 0:
                break  # no waiting requested (post-train chain)
            wait_second = 30
            if jax.process_index() == 0:
                print('Wait %s seconds for next check (progress: %.1f / %d minutes): %s'
                      % (wait_second, total_time * 1.0 / 60, args.max_waiting_mins, ckpt_dir),
                      end='\r', flush=True)
            time.sleep(wait_second)
            total_time += 30
            if total_time > args.max_waiting_mins * 60 and (first_eval is False):
                break
            continue
        total_time = 0
        first_eval = False

        load_params_into_network(net, cur_ckpt, logger)
        net._eval_fn = None  # new params may change structure

        cur_result_dir = eval_output_dir / f'epoch_{cur_epoch_id}' / \
            cfg.DATA_CONFIG.DATA_SPLIT['test']
        tb_dict = eval_utils.eval_one_epoch(
            cfg, net, test_loader, cur_epoch_id, logger, dist_test=dist_test,
            result_dir=cur_result_dir, save_to_file=args.save_to_file)

        if tb_log is not None:
            for key, val in tb_dict.items():
                tb_log.add_scalar(key, val, int(float(cur_epoch_id)))
        with open(ckpt_record_file, 'a') as f:
            print(f'{cur_epoch_id}', file=f)
        logger.info('Epoch %s has been evaluated', cur_epoch_id)


def main():
    args, cfg_ = parse_config()
    if args.launcher == 'jax':
        common_utils.init_dist_jax(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes, process_id=args.process_id)
    dist_test = jax.process_count() > 1

    n_devices = len(jax.devices())
    if args.batch_size is None:
        args.batch_size = cfg_.OPTIMIZATION.BATCH_SIZE_PER_GPU * n_devices

    output_dir = cfg_.ROOT_DIR / 'output' / cfg_.EXP_GROUP_PATH / cfg_.TAG / args.extra_tag
    output_dir.mkdir(parents=True, exist_ok=True)
    eval_output_dir = output_dir / 'eval'

    if not args.eval_all:
        num_list = re.findall(r'\d+', args.ckpt) if args.ckpt is not None else []
        epoch_id = num_list[-1] if num_list else 'no_number'
        eval_output_dir = eval_output_dir / f'epoch_{epoch_id}' / \
            cfg_.DATA_CONFIG.DATA_SPLIT['test']
    else:
        eval_output_dir = eval_output_dir / 'eval_all_default'
    if args.eval_tag is not None:
        eval_output_dir = eval_output_dir / args.eval_tag
    eval_output_dir.mkdir(parents=True, exist_ok=True)

    log_file = eval_output_dir / f'log_eval_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt'
    logger = common_utils.create_logger(log_file, rank=jax.process_index())
    logger.info('**********************Start logging**********************')
    for key, val in vars(args).items():
        logger.info('%s: %s', key, val)
    log_config_to_file(cfg_, logger=logger)

    test_set, test_loader, sampler = build_dataloader(
        dataset_cfg=cfg_.DATA_CONFIG, class_names=cfg_.CLASS_NAMES,
        batch_size=args.batch_size, dist=dist_test,
        root_path=Path(cfg_.DATA_CONFIG.DATA_PATH), workers=args.workers,
        logger=logger, training=False)

    net = build_network(cfg_.MODEL, num_class=len(cfg_.CLASS_NAMES), dataset=test_set)

    # initialize parameter structure with one example batch (eval path)
    init_batch = test_set.collate_batch([test_set[0]])
    device_init = {k: v for k, v in init_batch.items() if isinstance(v, np.ndarray)}
    net.init(jax.random.PRNGKey(0), device_init, train=False)

    if args.eval_all:
        ckpt_dir = args.ckpt_dir if args.ckpt_dir is not None else output_dir / 'ckpt'
        repeat_eval_ckpt(net, test_loader, args, eval_output_dir, logger,
                         ckpt_dir, dist_test=dist_test)
    else:
        epoch_id = 'no_number'
        if args.ckpt is not None:
            epoch_id = load_params_into_network(net, args.ckpt, logger)
        eval_single_ckpt(net, test_loader, args, eval_output_dir, logger,
                         epoch_id, dist_test=dist_test)


if __name__ == '__main__':
    main()
