"""Training CLI.

Parity target: /root/reference/tools/train.py (argparse:21-55, dist init +
per-device batch split:63-76, output dir layout
output/<exp_group>/<tag>/<extra_tag>/{ckpt,tensorboard,eval}:83-104,
auto-resume from latest ckpt:131-141, post-train eval:180-196).

TPU-native: the DDP wrap becomes a jax.sharding Mesh over all local chips;
the per-GPU batch size becomes per-chip (global batch = per_chip * n_chips).
"""

import argparse
import datetime
import glob
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from hvpr_tpu.config import (cfg, cfg_from_list, cfg_from_yaml_file,
                             log_config_to_file)
from hvpr_tpu.datasets import build_dataloader
from hvpr_tpu.models import build_network
from hvpr_tpu.optimization import build_optimizer
from hvpr_tpu.parallel import TrainState, make_mesh, make_train_step
from hvpr_tpu.utils import common_utils
from train_utils.train_utils import load_checkpoint, train_model


def parse_config():
    parser = argparse.ArgumentParser(description='hvpr_tpu training')
    parser.add_argument('--cfg_file', type=str, default=None, help='config for training')
    parser.add_argument('--batch_size', type=int, default=None, help='global batch size')
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None, help='checkpoint to start from')
    parser.add_argument('--pretrained_model', type=str, default=None)
    parser.add_argument('--launcher', choices=['none', 'jax'], default='none')
    parser.add_argument('--coordinator_address', type=str, default=None,
                        help='multi-host: host:port of process 0 (env auto-detect if unset)')
    parser.add_argument('--num_processes', type=int, default=None)
    parser.add_argument('--process_id', type=int, default=None)
    parser.add_argument('--sync_bn', action='store_true', default=False,
                        help='(always on: cross-replica BN stats are implicit)')
    parser.add_argument('--fix_random_seed', action='store_true', default=False)
    parser.add_argument('--ckpt_save_interval', type=int, default=1)
    parser.add_argument('--max_ckpt_save_num', type=int, default=30)
    parser.add_argument('--merge_all_iters_to_one_epoch', action='store_true', default=False)
    parser.add_argument('--num_epochs_to_eval', type=int, default=10,
                        help='post-train: evaluate the last N checkpoints')
    parser.add_argument('--max_waiting_mins', type=int, default=0,
                        help='post-train eval watcher timeout (0: no wait)')
    parser.add_argument('--save_to_file', action='store_true', default=False)
    parser.add_argument('--set', dest='set_cfgs', default=None, nargs=argparse.REMAINDER,
                        help='set extra config keys')
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = '/'.join(args.cfg_file.split('/')[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg_ = parse_config()
    if args.launcher == 'jax':
        common_utils.init_dist_jax(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes, process_id=args.process_id)
    dist_train = jax.process_count() > 1

    n_devices = len(jax.devices())
    if args.batch_size is None:
        args.batch_size = cfg_.OPTIMIZATION.BATCH_SIZE_PER_GPU * n_devices
    assert args.batch_size % n_devices == 0, \
        f'global batch size {args.batch_size} not divisible by {n_devices} devices'
    args.epochs = cfg_.OPTIMIZATION.NUM_EPOCHS if args.epochs is None else args.epochs

    if args.fix_random_seed:
        common_utils.set_random_seed(666)

    output_dir = cfg_.ROOT_DIR / 'output' / cfg_.EXP_GROUP_PATH / cfg_.TAG / args.extra_tag
    ckpt_dir = output_dir / 'ckpt'
    output_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    log_file = output_dir / f'log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt'
    logger = common_utils.create_logger(log_file, rank=jax.process_index())
    logger.info('**********************Start logging**********************')
    logger.info('devices: %s', jax.devices())
    for key, val in vars(args).items():
        logger.info('%s: %s', key, val)
    log_config_to_file(cfg_, logger=logger)

    tb_log = None
    if jax.process_index() == 0:
        from torch.utils.tensorboard import SummaryWriter
        tb_log = SummaryWriter(log_dir=str(output_dir / 'tensorboard'))

    train_set, train_loader, train_sampler = build_dataloader(
        dataset_cfg=cfg_.DATA_CONFIG, class_names=cfg_.CLASS_NAMES,
        batch_size=args.batch_size, dist=dist_train,
        root_path=Path(cfg_.DATA_CONFIG.DATA_PATH), workers=args.workers,
        logger=logger, training=True,
        merge_all_iters_to_one_epoch=args.merge_all_iters_to_one_epoch,
        total_epochs=args.epochs)

    net = build_network(cfg_.MODEL, num_class=len(cfg_.CLASS_NAMES), dataset=train_set)

    # initialize parameters with one example batch
    init_batch = train_set.collate_batch([train_set[0]])
    device_init = {k: v for k, v in init_batch.items() if isinstance(v, np.ndarray)}
    variables = net.init(jax.random.PRNGKey(0), device_init, train=True)

    # under --merge_all_iters_to_one_epoch the dataset length (and thus
    # len(train_loader)) is ALREADY multiplied by epochs — multiplying again
    # would hand the OneCycle schedule epochs^2 steps and leave LR stuck in
    # its warm-up region for the whole run
    if args.merge_all_iters_to_one_epoch:
        total_steps = len(train_loader)
        iters_each_epoch = len(train_loader) // max(args.epochs, 1)
    else:
        total_steps = len(train_loader) * args.epochs
        iters_each_epoch = len(train_loader)
    tx, lr_fn = build_optimizer(
        variables['params'], cfg_.OPTIMIZATION,
        total_steps=total_steps,
        total_iters_each_epoch=iters_each_epoch)

    state = TrainState.create(variables, tx)
    start_epoch = it = 0

    if args.pretrained_model is not None:
        net.variables = {'params': state.params, 'batch_stats': state.batch_stats}
        if str(args.pretrained_model).endswith('.pth'):
            # torch reference checkpoint (name-mapped + layout-transformed)
            from hvpr_tpu.utils.torch_ckpt import load_pth_into_variables
            net.variables, report = load_pth_into_variables(
                args.pretrained_model, net.variables, logger=logger)
            skipped = report['mismatched'] + report['missing']
        else:
            ckpt = load_checkpoint(args.pretrained_model)
            skipped = net.load_state_dict(ckpt['model_state'])
        state = state.replace(params=net.variables['params'],
                              batch_stats=net.variables['batch_stats'])
        logger.info('Loaded pretrained model, skipped keys: %s', skipped)

    ckpt_to_resume = args.ckpt
    if ckpt_to_resume is None:
        ckpt_list = glob.glob(str(ckpt_dir / 'checkpoint_epoch_*.msgpack'))
        if ckpt_list:
            ckpt_list.sort(key=os.path.getmtime)
            ckpt_to_resume = ckpt_list[-1]
    if ckpt_to_resume is not None:
        payload = load_checkpoint(ckpt_to_resume, state)
        state = state.replace(params=payload['model_state']['params'],
                              batch_stats=payload['model_state']['batch_stats'],
                              opt_state=payload['optimizer_state'])
        start_epoch = int(payload['epoch'])
        it = int(payload['it'])
        logger.info('Resumed from %s (epoch %d, it %d)', ckpt_to_resume,
                    start_epoch, it)

    mesh = make_mesh()
    train_step = make_train_step(net.module, tx, mesh=mesh)

    logger.info('**********************Start training %s/%s(%s)**********************',
                cfg_.EXP_GROUP_PATH, cfg_.TAG, args.extra_tag)
    state, it = train_model(
        train_step, state, train_loader, mesh, lr_fn,
        start_epoch=start_epoch, total_epochs=args.epochs, start_iter=it,
        ckpt_save_dir=ckpt_dir, train_sampler=train_sampler, tb_log=tb_log,
        ckpt_save_interval=args.ckpt_save_interval,
        max_ckpt_save_num=args.max_ckpt_save_num,
        merge_all_iters_to_one_epoch=args.merge_all_iters_to_one_epoch,
        net=net, logger=logger)
    logger.info('**********************End training**********************')

    # post-train: auto-evaluate the last N checkpoints via the test.py
    # watcher, as the reference does (reference train.py:180-196).
    logger.info('**********************Start evaluation %s/%s(%s)**********************',
                cfg_.EXP_GROUP_PATH, cfg_.TAG, args.extra_tag)
    # load tools/test.py by path — a bare `import test` resolves to the
    # stdlib test package when tools/ is not sys.path[0] (python -m, imports)
    import importlib.util
    _spec = importlib.util.spec_from_file_location(
        'hvpr_test_cli', str(Path(__file__).resolve().parent / 'test.py'))
    test_cli = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(test_cli)

    test_set, test_loader, _ = build_dataloader(
        dataset_cfg=cfg_.DATA_CONFIG, class_names=cfg_.CLASS_NAMES,
        batch_size=args.batch_size, dist=dist_train,
        root_path=Path(cfg_.DATA_CONFIG.DATA_PATH), workers=args.workers,
        logger=logger, training=False)
    eval_net = build_network(cfg_.MODEL, num_class=len(cfg_.CLASS_NAMES),
                             dataset=test_set)
    init_batch = test_set.collate_batch([test_set[0]])
    device_init = {k: v for k, v in init_batch.items()
                   if isinstance(v, np.ndarray)}
    eval_net.init(jax.random.PRNGKey(0), device_init, train=False)

    eval_output_dir = output_dir / 'eval' / 'eval_with_train'
    eval_output_dir.mkdir(parents=True, exist_ok=True)
    args.start_epoch = max(args.epochs - args.num_epochs_to_eval, 0)
    test_cli.repeat_eval_ckpt(
        eval_net, test_loader, args, eval_output_dir, logger, ckpt_dir,
        dist_test=dist_train)
    logger.info('**********************End evaluation**********************')


if __name__ == '__main__':
    main()
