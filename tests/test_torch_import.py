"""Torch .pth -> flax importer: layout parity per layer type + full-model map.

Validates hvpr_tpu/utils/torch_ckpt.py against real torch ops (torch is an
environment dependency): Linear/Conv2d/ConvTranspose2d/BatchNorm numerical
parity after the layout transforms, full-tree key coverage on the tiny HVPR
model, and the reference's shape-checked partial-load semantics
(reference detector3d_template.py:332-346).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import flax.linen as nn

from hvpr_tpu.utils import torch_ckpt
from tests.test_model import tiny_model_cfg, _FakeDataset, make_batch


def test_linear_parity():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 5)).astype(np.float32)          # torch (out, in)
    x = rng.normal(size=(3, 5)).astype(np.float32)
    ours = x @ torch_ckpt._t_linear(w)
    theirs = F.linear(torch.from_numpy(x), torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_conv2d_parity():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)    # OIHW
    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)    # NCHW
    theirs = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                      stride=2, padding=1).numpy()

    mod = nn.Conv(6, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                  use_bias=False)
    params = {'params': {'kernel': jnp.asarray(torch_ckpt._t_conv(w))}}
    ours = mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               theirs, rtol=1e-4, atol=1e-4)


def test_conv_transpose_parity():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(4, 6, 2, 2)).astype(np.float32)    # torch (in, out, kH, kW)
    x = rng.normal(size=(2, 4, 5, 7)).astype(np.float32)
    theirs = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                stride=2).numpy()

    mod = nn.ConvTranspose(6, (2, 2), strides=(2, 2), padding='VALID',
                           use_bias=False)
    params = {'params': {'kernel': jnp.asarray(torch_ckpt._t_conv_transpose(w))}}
    ours = mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               theirs, rtol=1e-4, atol=1e-4)


def test_batchnorm_parity():
    rng = np.random.default_rng(3)
    weight = rng.normal(size=4).astype(np.float32)
    bias = rng.normal(size=4).astype(np.float32)
    mean = rng.normal(size=4).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=4).astype(np.float32)
    x = rng.normal(size=(2, 4, 3, 3)).astype(np.float32)

    bn = torch.nn.BatchNorm2d(4, eps=1e-3)
    bn.weight.data = torch.from_numpy(weight)
    bn.bias.data = torch.from_numpy(bias)
    bn.running_mean.data = torch.from_numpy(mean)
    bn.running_var.data = torch.from_numpy(var)
    bn.eval()
    theirs = bn(torch.from_numpy(x)).detach().numpy()

    mod = nn.BatchNorm(use_running_average=True, epsilon=1e-3)
    variables = {
        'params': {'scale': jnp.asarray(weight), 'bias': jnp.asarray(bias)},
        'batch_stats': {'mean': jnp.asarray(mean), 'var': jnp.asarray(var)},
    }
    ours = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               theirs, rtol=1e-4, atol=1e-4)


# -- full-model mapping -------------------------------------------------------

_INVERSE_SHAPE = {
    torch_ckpt._t_linear: lambda s: (s[1], s[0]),
    torch_ckpt._t_conv: lambda s: (s[3], s[2], s[0], s[1]),
    torch_ckpt._t_conv_transpose: lambda s: (s[2], s[3], s[0], s[1]),
    torch_ckpt._t_conv1x1_as_dense: lambda s: (s[1], s[0], 1, 1),
    torch_ckpt._t_identity: lambda s: s,
}


@pytest.fixture(scope='module')
def tiny_variables():
    from hvpr_tpu.models import build_network
    net = build_network(tiny_model_cfg(), num_class=1, dataset=_FakeDataset())
    batch = make_batch(np.random.default_rng(0))
    fn = functools.partial(
        net.module.init, {'params': jax.random.PRNGKey(0)}, batch, train=True)
    return jax.eval_shape(fn)


def _flat_paths(variables):
    flat, _ = jax.tree_util.tree_flatten_with_path(variables)
    for path, leaf in flat:
        yield tuple(p.key for p in path), leaf


def test_every_leaf_maps(tiny_variables):
    unmapped = [
        '/'.join(parts) for parts, _ in _flat_paths(tiny_variables)
        if torch_ckpt.flax_path_to_torch_key(parts) is None
    ]
    assert not unmapped, unmapped


def _synthetic_state_dict(variables, rng):
    state = {}
    for parts, leaf in _flat_paths(variables):
        key, transform = torch_ckpt.flax_path_to_torch_key(parts)
        tshape = _INVERSE_SHAPE[transform](tuple(leaf.shape))
        state[key] = rng.normal(size=tshape).astype(np.float32)
    return state


def test_full_import_loads_everything(tiny_variables):
    rng = np.random.default_rng(7)
    state = _synthetic_state_dict(tiny_variables, rng)
    new_vars, report = torch_ckpt.import_torch_state(tiny_variables, state)

    n_leaves = len(list(_flat_paths(tiny_variables)))
    assert len(report['loaded']) == n_leaves
    assert not report['missing'] and not report['mismatched']
    assert not report['unused_torch_keys']

    # spot-check a value actually went through the transform
    for parts, leaf in _flat_paths(new_vars):
        key, transform = torch_ckpt.flax_path_to_torch_key(parts)
        np.testing.assert_array_equal(np.asarray(leaf), transform(state[key]))
        break


def test_partial_load_semantics(tiny_variables):
    rng = np.random.default_rng(8)
    state = _synthetic_state_dict(tiny_variables, rng)

    # corrupt one shape, drop one key
    some_keys = sorted(state)
    state[some_keys[0]] = np.zeros((1, 2, 3), np.float32)
    del state[some_keys[1]]

    _, report = torch_ckpt.import_torch_state(tiny_variables, state)
    assert len(report['mismatched']) >= 1
    assert any(some_keys[1] in m for m in report['missing'])
    # everything else still loads
    n_leaves = len(list(_flat_paths(tiny_variables)))
    assert len(report['loaded']) >= n_leaves - 3


@pytest.fixture(scope='module')
def flagship_variables():
    """abstract (eval_shape) variables of the FULL hvpr.yaml model —
    every reference module at flagship sizes (VERDICT r2 #9)."""
    from hvpr_tpu.config import ConfigDict, cfg_from_yaml_file
    from hvpr_tpu.models import build_network

    cfg = ConfigDict()
    cfg_from_yaml_file('tools/cfgs/kitti_models/hvpr.yaml', cfg)

    class _DS:
        class_names = ['Car']
        point_cloud_range = np.asarray(
            cfg['DATA_CONFIG']['POINT_CLOUD_RANGE'], np.float32)
        voxel_size = np.asarray([0.16, 0.16, 3.0], np.float32)
        grid_size = np.asarray([296, 248, 1], np.int64)

    net = build_network(cfg['MODEL'], num_class=1, dataset=_DS())
    b, n, v, p = 1, 16384, 16000, 32
    spec = {
        'points': jax.ShapeDtypeStruct((b, n, 4), jnp.float32),
        'point_valid_mask': jax.ShapeDtypeStruct((b, n), jnp.bool_),
        'voxels': jax.ShapeDtypeStruct((b, v, p, 4), jnp.float32),
        'voxel_num_points': jax.ShapeDtypeStruct((b, v), jnp.int32),
        'voxel_coords': jax.ShapeDtypeStruct((b, v, 3), jnp.int32),
        'voxel_mask': jax.ShapeDtypeStruct((b, v), jnp.bool_),
        'gt_boxes': jax.ShapeDtypeStruct((b, 8, 8), jnp.float32),
    }
    return jax.eval_shape(
        lambda b: net.module.init({'params': jax.random.PRNGKey(0)}, b,
                                  train=True), spec)


@pytest.mark.slow
def test_flagship_every_leaf_maps(flagship_variables):
    unmapped = [
        '/'.join(parts) for parts, _ in _flat_paths(flagship_variables)
        if torch_ckpt.flax_path_to_torch_key(parts) is None
    ]
    assert not unmapped, unmapped


@pytest.mark.slow
def test_flagship_full_import(flagship_variables):
    """A reference-keyed state dict at flagship sizes loads completely:
    memory 2000x64, PointNet2MSG MSG stacks, 3-level BEV pyramid + SFM,
    scale stream, head convs — no unmatched or leftover keys."""
    rng = np.random.default_rng(11)
    state = _synthetic_state_dict(flagship_variables, rng)
    # the flagship memory table must be present at reference size
    assert state['map_to_bev_module.memory.weight'].shape == (2000, 64)
    assert any(k.startswith('backbone_3d.SA_modules.1.mlps.1') for k in state)
    assert any(k.startswith('backbone_2d.deblocks.2') for k in state)

    new_vars, report = torch_ckpt.import_torch_state(flagship_variables, state)
    n_leaves = len(list(_flat_paths(flagship_variables)))
    assert len(report['loaded']) == n_leaves
    assert not report['missing'] and not report['mismatched']
    assert not report['unused_torch_keys']


def test_pth_roundtrip(tmp_path, tiny_variables):
    """Write a reference-style checkpoint wrapper and load via the file API."""
    rng = np.random.default_rng(9)
    state = {k: torch.from_numpy(v)
             for k, v in _synthetic_state_dict(tiny_variables, rng).items()}
    ckpt = {'model_state': state, 'epoch': 3, 'it': 100, 'version': 'ref'}
    path = tmp_path / 'checkpoint_epoch_3.pth'
    torch.save(ckpt, path)

    new_vars, report = torch_ckpt.load_pth_into_variables(
        str(path), tiny_variables)
    assert not report['missing'] and not report['mismatched']
