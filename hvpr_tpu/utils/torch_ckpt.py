"""PyTorch reference-checkpoint importer: ``.pth`` state dict -> flax variables.

The reference trains with torch and ships ``checkpoint_epoch_N.pth`` files
holding a ``model_state`` dict (reference tools/train_utils/train_utils.py:
124-140); AP-parity against the reference checkpoint (BASELINE.md) requires
loading those weights into this framework's flax modules. This importer maps
every flax leaf to its torch key, applies the layout transforms
(Linear transpose, Conv OIHW->HWIO, ConvTranspose IOHW->HWIO, BatchNorm
weight/bias/running_* -> scale/bias/batch_stats), and keeps the reference's
shape-checked partial-load semantics (detector3d_template.py:332-346): only
shape-matching keys update, everything else is reported.

Torch-side key layout per reference module definitions:
  vfe.pfn_layers.{i}.{linear,norm}               pillar_vfe.py:22-23
  vfe.pfn_scale_layers.{i}.{0,1}                 pillar_vfe.py:160-163
  map_to_bev_module.memory.weight                pointpillar_scatter.py:63
  backbone_2d.blocks.{i}.{seq}                   base_bev_backbone.py:154-169
  backbone_2d.sfmblocks_down.{i}.{0,1}           base_bev_backbone.py:171-176
  backbone_2d.deblocks.{i}.{0,1}                 base_bev_backbone.py:180-199
  backbone_2d.scale_layers.{i}.{1,2}             base_bev_backbone.py:201-209
  backbone_2d.attention.spatial.{conv,norm}      spatial_attention.py:26-27,55
  dense_head.conv_{cls,box,dir_cls}              anchor_head_single.py:16-32
  backbone_3d.SA_modules.{i}.mlps.{j}.{3k}       (absent from the snapshot;
  backbone_3d.FP_modules.{i}.mlp.{3k}             standard OpenPCDet v0.3
                                                  pointnet2 Sequential layout)
"""

import re

import numpy as np


def load_torch_state_dict(path):
    """Read a torch checkpoint into {key: numpy array}.

    Accepts either a bare state dict or the reference's checkpoint wrapper
    with a ``model_state`` entry.
    """
    import torch
    blob = torch.load(path, map_location='cpu', weights_only=False)
    state = blob.get('model_state', blob) if isinstance(blob, dict) else blob
    return {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
            for k, v in state.items()}


# -- layout transforms -------------------------------------------------------

def _t_linear(w):
    return np.transpose(w)                       # (out, in) -> (in, out)


def _t_conv(w):
    return np.transpose(w, (2, 3, 1, 0))         # OIHW -> HWIO


def _t_conv_transpose(w):
    # torch's ConvTranspose2d is the conv adjoint (spatially flipped kernel);
    # flax's ConvTranspose applies the kernel unflipped — so flip H and W.
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]  # IOHW -> HWIO, flipped


def _t_conv1x1_as_dense(w):
    return np.transpose(w[:, :, 0, 0])           # (out, in, 1, 1) -> (in, out)


def _t_identity(w):
    return np.asarray(w)


# -- flax path -> (torch key, transform) -------------------------------------

def _bn_field(leaf):
    """flax BN leaf name -> torch BN field."""
    return {'scale': 'weight', 'bias': 'bias',
            'mean': 'running_mean', 'var': 'running_var'}[leaf]


def _translate(parts):
    """One flax variable path (collection dropped) -> (torch_key, transform).

    Returns None for flax leaves with no torch counterpart.
    """
    p = list(parts)
    leaf = p[-1]

    def idx(name):
        return int(name.rsplit('_', 1)[1])

    if p[0] == 'vfe':
        if p[1].startswith('PFNLayer_'):
            i = idx(p[1])
            if p[2].startswith('Dense'):
                return f'vfe.pfn_layers.{i}.linear.weight', _t_linear
            return f'vfe.pfn_layers.{i}.norm.{_bn_field(leaf)}', _t_identity
        if p[1].startswith('Dense_'):
            return f'vfe.pfn_scale_layers.{idx(p[1])}.0.weight', _t_linear
        if p[1].startswith('MaskedBatchNorm_'):
            return (f'vfe.pfn_scale_layers.{idx(p[1])}.1.{_bn_field(leaf)}',
                    _t_identity)

    if p[0] == 'map_to_bev' and p[1] == 'memory':
        return 'map_to_bev_module.memory.weight', _t_identity

    if p[0] == 'backbone_2d':
        group, i = p[1].rsplit('_', 1) if '_' in p[1] else (p[1], None)
        if group == 'blocks':
            j = idx(p[2])
            # torch Sequential: [pad, conv, bn, relu] + [conv, bn, relu]*
            # -> conv j at 1 + 3j, bn j at 2 + 3j.
            if p[3].startswith('Conv'):
                return f'backbone_2d.blocks.{i}.{1 + 3 * j}.weight', _t_conv
            return (f'backbone_2d.blocks.{i}.{2 + 3 * j}.{_bn_field(leaf)}',
                    _t_identity)
        if group == 'deblocks':
            if p[2].startswith('ConvTranspose'):
                return (f'backbone_2d.deblocks.{i}.0.weight',
                        _t_conv_transpose)
            if p[2].startswith('Conv'):
                return f'backbone_2d.deblocks.{i}.0.weight', _t_conv
            return (f'backbone_2d.deblocks.{i}.1.{_bn_field(leaf)}',
                    _t_identity)
        if group == 'scale_blocks':
            if p[2].startswith('Conv'):
                return f'backbone_2d.scale_layers.{i}.1.weight', _t_conv
            return (f'backbone_2d.scale_layers.{i}.2.{_bn_field(leaf)}',
                    _t_identity)
        if group == 'sfm_blocks':
            if p[2].startswith('Conv'):
                return f'backbone_2d.sfmblocks_down.{i}.0.weight', _t_conv
            return (f'backbone_2d.sfmblocks_down.{i}.1.{_bn_field(leaf)}',
                    _t_identity)
        if p[1] == 'attention':
            if p[2].startswith('Conv'):
                field = 'weight' if leaf == 'kernel' else 'bias'
                tf = _t_conv if leaf == 'kernel' else _t_identity
                return f'backbone_2d.attention.spatial.conv.{field}', tf
            return (f'backbone_2d.attention.spatial.norm.{_bn_field(leaf)}',
                    _t_identity)

    if p[0] == 'dense_head':
        name = {'conv_dir': 'conv_dir_cls'}.get(p[1], p[1])
        field = 'weight' if leaf == 'kernel' else 'bias'
        tf = _t_conv if leaf == 'kernel' else _t_identity
        return f'dense_head.{name}.{field}', tf

    if p[0] == 'backbone_3d':
        if p[1].startswith('SAModuleMSG_'):
            i, j = idx(p[1]), idx(p[2])
            base = f'backbone_3d.SA_modules.{i}.mlps.{j}'
        elif p[1].startswith('FPModule_'):
            base = f'backbone_3d.FP_modules.{idx(p[1])}.mlp'
        else:
            return None
        k = idx(p[3])
        if p[3].startswith('Dense'):
            return f'{base}.{3 * k}.weight', _t_conv1x1_as_dense
        return f'{base}.{3 * k + 1}.{_bn_field(leaf)}', _t_identity

    return None


def flax_path_to_torch_key(collection_path):
    """('params', 'vfe', ...) -> (torch_key, transform) or None."""
    return _translate(collection_path[1:])


# -- the import --------------------------------------------------------------

def import_torch_state(variables, state_dict, logger=None):
    """Return (updated variables pytree, report dict).

    Partial-load semantics: a flax leaf updates iff its mapped torch key
    exists AND the transformed tensor matches the leaf shape; everything
    else is left at its current value and reported.
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(variables)
    consumed, loaded, missing, mismatched = set(), [], [], []

    def convert(path, leaf):
        parts = tuple(
            p.key if hasattr(p, 'key') else str(p) for p in path)
        mapped = flax_path_to_torch_key(parts)
        name = '/'.join(parts)
        if mapped is None:
            missing.append(name)
            return leaf
        key, transform = mapped
        if key not in state_dict:
            missing.append(f'{name} <- {key} (absent)')
            return leaf
        consumed.add(key)
        value = transform(state_dict[key])
        if tuple(value.shape) != tuple(leaf.shape):
            mismatched.append(
                f'{name} <- {key}: torch {value.shape} vs flax {leaf.shape}')
            return leaf
        loaded.append(name)
        return value.astype(np.asarray(leaf).dtype)

    new_leaves = [convert(path, leaf) for path, leaf in flat[0]]
    new_vars = jax.tree_util.tree_unflatten(flat[1], new_leaves)

    unused = sorted(
        k for k in state_dict
        if k not in consumed and not k.endswith('num_batches_tracked'))
    report = {'loaded': loaded, 'missing': missing,
              'mismatched': mismatched, 'unused_torch_keys': unused}
    if logger is not None:
        logger.info('torch import: %d loaded, %d unmatched flax leaves, '
                    '%d shape mismatches, %d unused torch keys',
                    len(loaded), len(missing), len(mismatched), len(unused))
        for line in mismatched:
            logger.info('  shape mismatch: %s', line)
    return new_vars, report


def load_pth_into_variables(path, variables, logger=None):
    """Convenience: read a .pth file and import it into ``variables``."""
    return import_torch_state(variables, load_torch_state_dict(path),
                              logger=logger)
