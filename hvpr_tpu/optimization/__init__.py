"""Optimizer + LR-schedule factory (optax).

Parity target: /root/reference/tools/train_utils/optimization/__init__.py
(build_optimizer adam/sgd/adam_onecycle:11-36, build_scheduler OneCycle or
decay-step LambdaLR + optional cosine warmup:39-63), fastai_optim.py
(OptimWrapper true weight decay applied outside the adam statistics:132-149,
BN/bias excluded from decay:13-24) and learning_schedules_fastai.py
(OneCycle cosine lr+momentum phases:60-77, CosineWarmupLR:80-89).

TPU-native: one optax chain — global-norm clip -> adam with scheduled lr and
scheduled beta1 (the fastai momentum schedule) -> decoupled weight decay
masked off BatchNorm parameters and biases. The whole chain lives inside the
jitted train step.
"""

import math

import jax.numpy as jnp
import numpy as np
import optax


def _annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1
    return end + (start - end) / 2 * cos_out


def one_cycle_lr_schedule(lr_max, total_steps, moms=(0.95, 0.85), div_factor=10.0,
                          pct_start=0.4):
    """fastai OneCycle: cosine up to lr_max then cosine down to lr_max/1e4."""
    low_lr = lr_max / div_factor
    boundary = pct_start * total_steps

    def lr_fn(step):
        step = jnp.minimum(step, total_steps)
        pct1 = jnp.clip(step / jnp.maximum(boundary, 1), 0, 1)
        pct2 = jnp.clip((step - boundary) / jnp.maximum(total_steps - boundary, 1), 0, 1)
        up = _annealing_cos(low_lr, lr_max, pct1)
        down = _annealing_cos(lr_max, low_lr * 1e-4, pct2)
        return jnp.where(step <= boundary, up, down)

    def mom_fn(step):
        step = jnp.minimum(step, total_steps)
        pct1 = jnp.clip(step / jnp.maximum(boundary, 1), 0, 1)
        pct2 = jnp.clip((step - boundary) / jnp.maximum(total_steps - boundary, 1), 0, 1)
        up = _annealing_cos(moms[0], moms[1], pct1)
        down = _annealing_cos(moms[1], moms[0], pct2)
        return jnp.where(step <= boundary, up, down)

    return lr_fn, mom_fn


def decay_step_schedule(lr, decay_step_list, lr_decay, lr_clip,
                        total_iters_each_epoch, warmup_epoch=0, warmup=False,
                        div_factor=10.0):
    """LambdaLR over epochs with step milestones + optional cosine warmup
    (optimization/__init__.py:39-63 semantics: CosineWarmupLR ramps from
    eta_min = LR/DIV_FACTOR along (1 - cos(pi*t/T))/2)."""
    milestones = [m * total_iters_each_epoch for m in decay_step_list]
    warmup_steps = warmup_epoch * total_iters_each_epoch

    def lr_fn(step):
        decays = sum(jnp.where(step >= m, 1, 0) for m in milestones)
        cur = lr * (lr_decay ** decays)
        cur = jnp.maximum(cur, lr_clip)
        if warmup and warmup_steps > 0:
            eta_min = lr / div_factor
            pct = jnp.clip(step / warmup_steps, 0, 1)
            warm = eta_min + (lr - eta_min) * (1 - jnp.cos(jnp.pi * pct)) / 2
            cur = jnp.where(step < warmup_steps, warm, cur)
        return cur

    return lr_fn


def _no_decay_mask(params):
    """True for weight-decayed leaves: excludes biases and all norm params."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {}
    for k in flat:
        path = [str(x) for x in k]
        is_norm = any('BatchNorm' in p or 'MaskedBatchNorm' in p for p in path)
        is_bias = path[-1] in ('bias',)
        is_scale_or_stat = path[-1] in ('scale', 'mean', 'var')
        mask[k] = not (is_norm or is_bias or is_scale_or_stat)
    return flax.traverse_util.unflatten_dict(mask)


def build_optimizer(params, optim_cfg, total_steps=None, total_iters_each_epoch=None):
    """Build the optax transformation + the lr schedule function.

    Returns (tx, lr_fn) — lr_fn is exposed for logging parity with the
    reference's tensorboard 'meta_data/learning_rate' scalar.
    """
    name = optim_cfg['OPTIMIZER']
    lr = float(optim_cfg['LR'])
    wd = float(optim_cfg.get('WEIGHT_DECAY', 0.0))
    clip = float(optim_cfg.get('GRAD_NORM_CLIP', 0.0))

    if name == 'adam_onecycle':
        assert total_steps is not None
        lr_fn, mom_fn = one_cycle_lr_schedule(
            lr, total_steps,
            moms=tuple(optim_cfg.get('MOMS', [0.95, 0.85])),
            div_factor=float(optim_cfg.get('DIV_FACTOR', 10.0)),
            pct_start=float(optim_cfg.get('PCT_START', 0.4)))

        def adam_with_schedules():
            return optax.inject_hyperparams(
                lambda learning_rate, b1: optax.chain(
                    optax.scale_by_adam(b1=b1, b2=0.99),
                    optax.add_decayed_weights(wd, mask=_no_decay_mask(params)),
                    optax.scale_by_learning_rate(learning_rate),
                ))(learning_rate=lr_fn, b1=mom_fn)

        tx = adam_with_schedules()
    elif name in ('adam', 'sgd'):
        lr_fn = decay_step_schedule(
            lr, list(optim_cfg.get('DECAY_STEP_LIST', [])),
            float(optim_cfg.get('LR_DECAY', 0.1)),
            float(optim_cfg.get('LR_CLIP', 1e-7)),
            total_iters_each_epoch or 1,
            warmup_epoch=int(optim_cfg.get('WARMUP_EPOCH', 0)),
            warmup=bool(optim_cfg.get('LR_WARMUP', False)),
            div_factor=float(optim_cfg.get('DIV_FACTOR', 10.0)))
        # the reference's plain adam/sgd apply torch's COUPLED L2 to every
        # parameter (grad += wd * param before the moment updates; no BN/bias
        # exclusion — that exists only in adam_onecycle's OptimWrapper)
        inner = (optax.adam(learning_rate=lr_fn) if name == 'adam' else
                 optax.sgd(learning_rate=lr_fn,
                           momentum=float(optim_cfg.get('MOMENTUM', 0.9))))
        tx = optax.chain(optax.add_decayed_weights(wd), inner) if wd > 0 \
            else inner
    else:
        raise NotImplementedError(name)

    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, lr_fn
