"""Detection losses as pure jax functions.

Parity target: /root/reference/pcdet/utils/loss_utils.py
(SigmoidFocalClassificationLoss:9-72, WeightedSmoothL1Loss:75-136,
WeightedL1Loss:139-178, WeightedCrossEntropyLoss:181-206,
get_corner_loss_lidar:209-232). Stateless callables instead of nn.Modules —
all are jit/vmap/grad-safe.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import box_utils


class SigmoidFocalClassificationLoss:
    """Sigmoid focal loss (alpha=0.25, gamma=2.0 by default)."""

    def __init__(self, gamma: float = 2.0, alpha: float = 0.25):
        self.alpha = alpha
        self.gamma = gamma

    @staticmethod
    def sigmoid_cross_entropy_with_logits(input, target):
        """Numerically stable BCE-with-logits: max(x,0) - x*z + log(1 + exp(-|x|))."""
        return jnp.clip(input, 0, None) - input * target + jnp.log1p(jnp.exp(-jnp.abs(input)))

    def __call__(self, input, target, weights):
        """
        Args:
            input: (B, #anchors, #classes) logits.
            target: (B, #anchors, #classes) one-hot.
            weights: (B, #anchors) per-anchor weights.
        Returns:
            (B, #anchors, #classes) weighted loss.
        """
        pred_sigmoid = jax.nn.sigmoid(input)
        alpha_weight = target * self.alpha + (1 - target) * (1 - self.alpha)
        pt = target * (1.0 - pred_sigmoid) + (1.0 - target) * pred_sigmoid
        focal_weight = alpha_weight * jnp.power(pt, self.gamma)

        bce_loss = self.sigmoid_cross_entropy_with_logits(input, target)
        loss = focal_weight * bce_loss
        if weights.ndim == 2 or (weights.ndim == 1 and target.ndim == 2):
            weights = weights[..., None]
        return loss * weights


class WeightedSmoothL1Loss:
    """Code-weighted smooth-L1 with beta transition (default 1/9)."""

    def __init__(self, beta: float = 1.0 / 9.0, code_weights=None):
        self.beta = beta
        self.code_weights = None if code_weights is None else jnp.asarray(code_weights, dtype=jnp.float32)

    @staticmethod
    def smooth_l1_loss(diff, beta):
        if beta < 1e-5:
            return jnp.abs(diff)
        n = jnp.abs(diff)
        return jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)

    def __call__(self, input, target, weights=None):
        target = jnp.where(jnp.isnan(target), input, target)  # ignore nan targets
        diff = input - target
        if self.code_weights is not None:
            diff = diff * self.code_weights.reshape(1, 1, -1)
        loss = self.smooth_l1_loss(diff, self.beta)
        if weights is not None:
            loss = loss * weights[..., None]
        return loss


class WeightedL1Loss:
    def __init__(self, code_weights=None):
        self.code_weights = None if code_weights is None else jnp.asarray(code_weights, dtype=jnp.float32)

    def __call__(self, input, target, weights=None):
        target = jnp.where(jnp.isnan(target), input, target)
        diff = input - target
        if self.code_weights is not None:
            diff = diff * self.code_weights.reshape(1, 1, -1)
        loss = jnp.abs(diff)
        if weights is not None:
            loss = loss * weights[..., None]
        return loss


class WeightedCrossEntropyLoss:
    """Softmax CE over the last dim against one-hot targets (direction bins)."""

    def __call__(self, input, target, weights):
        log_probs = jax.nn.log_softmax(input, axis=-1)
        loss = -(target * log_probs).sum(axis=-1)
        return loss * weights


def get_corner_loss_lidar(pred_bbox3d, gt_bbox3d):
    """Corner-distance loss with flipped-heading minimum (loss_utils.py:209-232)."""
    assert pred_bbox3d.shape[0] == gt_bbox3d.shape[0]
    pred_box_corners = box_utils.boxes_to_corners_3d(pred_bbox3d)
    gt_box_corners = box_utils.boxes_to_corners_3d(gt_bbox3d)

    gt_bbox3d_flip = gt_bbox3d.at[:, 6].add(np.pi)
    gt_box_corners_flip = box_utils.boxes_to_corners_3d(gt_bbox3d_flip)
    corner_dist = jnp.minimum(
        jnp.linalg.norm(pred_box_corners - gt_box_corners, axis=2),
        jnp.linalg.norm(pred_box_corners - gt_box_corners_flip, axis=2),
    )  # (N, 8)
    corner_loss = WeightedSmoothL1Loss.smooth_l1_loss(corner_dist, beta=1.0)
    return corner_loss.mean(axis=1)
