"""Shared flax building blocks for the detection models.

TPU-native notes: all 2D convolutions run in NHWC (TPU conv layout); torch's
``Conv2d(padding=1)`` is reproduced with explicit ((1, 1), (1, 1)) padding so
strided outputs match the reference's window positions exactly. BatchNorm uses
eps=1e-3 / momentum 0.01 (flax momentum = 0.99) matching the reference's
``BatchNorm*(eps=1e-3, momentum=0.01)`` found throughout pillar_vfe.py and
base_bev_backbone.py.

``MaskedBatchNorm`` computes statistics over *valid* elements only — the
reference's ragged tensors never see padding rows, ours are fixed-shape, so
unmasked statistics would be polluted by padded voxels/points (documented
design deviation: the reference itself includes zeroed in-voxel padding rows
in its VFE BN statistics; we exclude all padding).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the channel axis with statistics from masked elements only.

    ``transposed=True`` accepts channel-major (C, R) inputs (the flat-VFE
    lane-aligned layout) with identical parameters/statistics — so the two
    layouts share checkpoints.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool, transposed: bool = False):
        """x: (..., C) or (C, R) if transposed; mask: bool over non-channel dims."""
        features = x.shape[0] if transposed else x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean', lambda: jnp.zeros((features,)))
        ra_var = self.variable('batch_stats', 'var', lambda: jnp.ones((features,)))
        scale = self.param('scale', nn.initializers.ones, (features,))
        bias = self.param('bias', nn.initializers.zeros, (features,))

        if train:
            # statistics ALWAYS accumulate in f32 (bf16 activations would
            # lose ~3 decimal digits over ~1e6-element sums); the converts
            # fuse into the reductions, so no extra materialization
            x32 = x.astype(jnp.float32)
            if transposed:
                m = mask.astype(jnp.float32)[None, :]
                count = jnp.clip(m.sum(), 1.0, None)
                mean = (x32 * m).sum(axis=1) / count
                var = ((x32 - mean[:, None]) ** 2 * m).sum(axis=1) / count
            else:
                m = mask.astype(jnp.float32)[..., None]
                count = jnp.clip(m.sum(), 1.0, None)
                reduce_axes = tuple(range(x.ndim - 1))
                mean = (x32 * m).sum(axis=reduce_axes) / count
                var = ((x32 - mean) ** 2 * m).sum(axis=reduce_axes) / count
            if not self.is_initializing():
                # torch BatchNorm normalizes with the biased batch variance
                # but stores the UNBIASED (n-1) estimator in running_var;
                # match it so eval-time numerics track the reference exactly
                # even at small masked counts (e.g. sparse scale-stream BN)
                var_update = var * (count / jnp.clip(count - 1.0, 1.0, None))
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var_update
        else:
            mean, var = ra_mean.value, ra_var.value

        if transposed:
            inv = jax.lax.rsqrt(var + self.epsilon)
            y = ((x.astype(jnp.float32) - mean[:, None]) * (inv * scale)[:, None]
                 + bias[:, None])
            return y.astype(x.dtype)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class DenseT(nn.Module):
    """Dense layer applied to channel-major (C_in, R) inputs.

    Parameter-compatible with ``nn.Dense`` (kernel (in, out), same init) —
    instantiate with ``name='Dense_N'`` to share a checkpoint slot with the
    row-major path.
    """

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x_t):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (x_t.shape[0], self.features))
        # follow the input dtype: bf16 activations run the matmul on the MXU
        # in bf16 with f32 accumulation and emit bf16 (params stay f32)
        y = jnp.einsum('io,ir->or', kernel.astype(x_t.dtype), x_t,
                       preferred_element_type=jnp.float32).astype(x_t.dtype)
        if self.use_bias:
            y = y + self.param('bias', nn.initializers.zeros,
                               (self.features,))[:, None].astype(x_t.dtype)
        return y


class SplitBatchNorm(nn.Module):
    """BatchNorm computing batch statistics PER leading-axis split.

    With ``splits=1`` this is numerically ``nn.BatchNorm`` (biased batch
    variance for both normalization and the stored running var, flax
    semantics, f32 statistics) and shares its variable names
    (params scale/bias, batch_stats mean/var) — name instances
    ``'BatchNorm_0'`` for checkpoint compatibility.

    ``splits=S`` treats the batch as S stacked groups of B/S samples:
    each group is normalized by its OWN batch statistics and the running
    stats are updated SEQUENTIALLY, group 0 first. This makes one batched
    conv pass over ``concat([map_a, map_b], axis=0)`` produce bit-identical
    BN behavior to the reference's two sequential shared-weight passes
    (base_bev_backbone.py:228-279 — forward x through the block, then
    x_point through the same block), while the convs run at 2x batch.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool, splits: int = 1):
        c = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))

        xf = x.astype(jnp.float32)
        if not train:
            y = (xf - ra_mean.value) * jax.lax.rsqrt(
                ra_var.value + self.epsilon)
            return y * scale + bias

        s = int(splits)
        b = x.shape[0]
        assert b % s == 0, (b, s)
        xs = xf.reshape(s, b // s, *x.shape[1:])
        red = tuple(range(1, xs.ndim - 1))
        mean_s = xs.mean(axis=red)                               # (s, C)
        bshape = (s,) + (1,) * (xs.ndim - 2) + (c,)
        var_s = ((xs - mean_s.reshape(bshape)) ** 2).mean(axis=red)
        y = (xs - mean_s.reshape(bshape)) * jax.lax.rsqrt(
            var_s.reshape(bshape) + self.epsilon)
        y = y.reshape(x.shape) * scale + bias

        if not self.is_initializing():
            m = self.momentum
            rm, rv = ra_mean.value, ra_var.value
            for i in range(s):                 # sequential: group 0 first
                rm = m * rm + (1 - m) * mean_s[i]
                rv = m * rv + (1 - m) * var_s[i]
            ra_mean.value = rm
            ra_var.value = rv
        return y


class ConvBNReLU(nn.Module):
    """3x3-style conv + BN + ReLU block (NHWC), torch-compatible padding.

    ``dtype=jnp.bfloat16`` runs the conv in bf16 (f32 params, f32 BN
    statistics) and emits bf16 activations — on TPU the BN/ReLU/cast fuse
    into the conv epilogue, so the HBM-resident tensor between blocks is
    half-width. Enabled by BACKBONE_2D.COMPUTE_DTYPE.

    ``splits`` (call-time): per-split BN statistics for stacked
    shared-weight passes — see :class:`SplitBatchNorm`.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_relu: bool = True
    use_bn: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool, splits: int = 1):
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=not self.use_bn, dtype=self.dtype)(x)
        if self.use_bn:
            x = SplitBatchNorm(momentum=0.99, epsilon=1e-3,
                               name='BatchNorm_0')(x, train, splits=splits)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.use_relu:
            x = nn.relu(x)
        return x


class DeconvBNReLU(nn.Module):
    """Transpose-conv upsampling block (NHWC)."""

    features: int
    stride: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool, splits: int = 1):
        x = nn.ConvTranspose(self.features, (self.stride, self.stride),
                             strides=(self.stride, self.stride), padding='VALID',
                             use_bias=False, dtype=self.dtype)(x)
        x = SplitBatchNorm(momentum=0.99, epsilon=1e-3,
                           name='BatchNorm_0')(x, train, splits=splits)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return nn.relu(x)
