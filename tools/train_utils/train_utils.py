"""Training loop + checkpoint IO.

Parity target: /root/reference/tools/train_utils/train_utils.py
(train_one_epoch per-iter scheduler/zero_grad/backward/clip/step:9-62,
train_model epoch loop + sampler.set_epoch + memory-row printout + rolling
checkpoint retention:64-121, checkpoint_state/save:124-151).

TPU-native: the whole optimizer step (incl. grad clip and the OneCycle
schedules) lives inside the jitted train step (hvpr_tpu.parallel); the loop
here only feeds fixed-shape host batches and logs. Checkpoints are msgpack
(flax.serialization) dicts {epoch, it, model_state, optimizer_state, version}.
"""

import glob
import os

import numpy as np
import tqdm

import flax
import jax


def train_one_epoch(train_step, state, train_loader, mesh, accumulated_iter,
                    tbar, tb_log=None, lr_fn=None, leave_pbar=False,
                    total_it_each_epoch=None, dataloader_iter=None):
    from hvpr_tpu.parallel import shard_host_batch

    if total_it_each_epoch is None:
        total_it_each_epoch = len(train_loader)
    if total_it_each_epoch == len(train_loader):
        dataloader_iter = iter(train_loader)

    pbar = tqdm.tqdm(total=total_it_each_epoch, leave=leave_pbar,
                     desc='train', dynamic_ncols=True)
    last_metrics = {}
    for _ in range(total_it_each_epoch):
        try:
            batch = next(dataloader_iter)
        except StopIteration:
            dataloader_iter = iter(train_loader)
            batch = next(dataloader_iter)

        device_batch = {k: v for k, v in batch.items()
                        if isinstance(v, np.ndarray)}
        if mesh is not None:
            device_batch = shard_host_batch(device_batch, mesh)
        state, metrics = train_step(state, device_batch)
        accumulated_iter += 1

        # metrics fetch is async; only sync occasionally for display
        if accumulated_iter % 10 == 0 or accumulated_iter == 1:
            last_metrics = {k: float(v) for k, v in metrics.items()}
            disp = {'loss': f"{last_metrics.get('loss', 0):.3f}"}
            if lr_fn is not None:
                disp['lr'] = f'{float(lr_fn(accumulated_iter)):.2e}'
            pbar.set_postfix(disp)
            if tb_log is not None:
                tb_log.add_scalar('train/loss', last_metrics.get('loss', 0), accumulated_iter)
                if lr_fn is not None:
                    tb_log.add_scalar('meta_data/learning_rate',
                                      float(lr_fn(accumulated_iter)), accumulated_iter)
                for key, val in last_metrics.items():
                    if key.startswith(('rpn_loss', 'mem_loss')):
                        tb_log.add_scalar('train/' + key, val, accumulated_iter)
        pbar.update()
        tbar.refresh()
    pbar.close()
    return state, accumulated_iter, last_metrics


def train_model(train_step, state, train_loader, mesh, lr_fn, start_epoch,
                total_epochs, start_iter, ckpt_save_dir, train_sampler=None,
                tb_log=None, ckpt_save_interval=1, max_ckpt_save_num=30,
                merge_all_iters_to_one_epoch=False, net=None, logger=None):
    accumulated_iter = start_iter
    with tqdm.trange(start_epoch, total_epochs, desc='epochs',
                     dynamic_ncols=True) as tbar:
        total_it_each_epoch = len(train_loader)
        dataloader_iter = None
        if merge_all_iters_to_one_epoch:
            assert hasattr(train_loader.dataset, 'merge_all_iters_to_one_epoch')
            train_loader.dataset.merge_all_iters_to_one_epoch(
                merge=True, epochs=total_epochs)
            total_it_each_epoch = len(train_loader) // max(total_epochs, 1)
            dataloader_iter = iter(train_loader)

        for cur_epoch in tbar:
            if train_sampler is not None and hasattr(train_sampler, 'set_epoch'):
                train_sampler.set_epoch(cur_epoch)

            state, accumulated_iter, metrics = train_one_epoch(
                train_step, state, train_loader, mesh, accumulated_iter, tbar,
                tb_log=tb_log, lr_fn=lr_fn,
                leave_pbar=(cur_epoch + 1 == total_epochs),
                total_it_each_epoch=total_it_each_epoch,
                dataloader_iter=dataloader_iter)

            # reference prints the first memory rows each epoch (train_utils.py:100-101)
            if logger is not None and 'map_to_bev' in state.params:
                mem = state.params.get('map_to_bev', {}).get('memory', {}).get('weight')
                if mem is not None:
                    logger.info('memory items[:2]: %s', np.asarray(mem[:2, :4]))

            trained_epoch = cur_epoch + 1
            if trained_epoch % ckpt_save_interval == 0:
                ckpt_list = glob.glob(str(ckpt_save_dir / 'checkpoint_epoch_*.msgpack'))
                ckpt_list.sort(key=os.path.getmtime)
                if len(ckpt_list) >= max_ckpt_save_num:
                    for cur_file_idx in range(len(ckpt_list) - max_ckpt_save_num + 1):
                        os.remove(ckpt_list[cur_file_idx])
                save_checkpoint(
                    state, trained_epoch, accumulated_iter,
                    filename=str(ckpt_save_dir / f'checkpoint_epoch_{trained_epoch}.msgpack'))
    return state, accumulated_iter


# ----------------------------------------------------------------- checkpoint

CKPT_VERSION = 'hvpr_tpu+0.1.0'


def checkpoint_state(state, epoch, it):
    return {
        'epoch': epoch,
        'it': it,
        'model_state': {
            'params': jax.device_get(state.params),
            'batch_stats': jax.device_get(state.batch_stats),
        },
        'optimizer_state': jax.device_get(state.opt_state),
        'version': CKPT_VERSION,
    }


def save_checkpoint(state, epoch, it, filename):
    payload = checkpoint_state(state, epoch, it)
    data = flax.serialization.to_bytes(payload)
    with open(filename, 'wb') as f:
        f.write(data)


def load_checkpoint(filename, state=None):
    """Load a checkpoint; when ``state`` is given, restore into its structure."""
    with open(filename, 'rb') as f:
        data = f.read()
    if state is None:
        return flax.serialization.msgpack_restore(data)
    template = checkpoint_state(state, 0, 0)
    return flax.serialization.from_bytes(template, data)
