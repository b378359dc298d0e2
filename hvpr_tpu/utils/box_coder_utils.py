"""Box residual codecs as pure functions over numpy or jax arrays.

Parity target: /root/reference/pcdet/utils/box_coder_utils.py
(ResidualCoder:5-77, PreviousResidualDecoder:80-107, PreviousResidualRoIDecoder:110-141,
PointResidualCoder:144-222). Torch tensors become namespace-generic arrays; the
``encode``/``decode`` methods are jit-traceable.
"""

import numpy as np

from .common_utils import _xp


class ResidualCoder:
    """SECOND-style 7-dof residual box codec, diagonal-normalized."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if self.encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        """Encode (N, 7+C) gt boxes against (N, 7+C) anchors."""
        xp = _xp(boxes)
        anchors_dims = xp.clip(anchors[..., 3:6], 1e-5, None)
        boxes_dims = xp.clip(boxes[..., 3:6], 1e-5, None)

        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors_dims[..., 0], anchors_dims[..., 1], anchors_dims[..., 2]
        ra = anchors[..., 6]
        xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
        dxg, dyg, dzg = boxes_dims[..., 0], boxes_dims[..., 1], boxes_dims[..., 2]
        rg = boxes[..., 6]

        diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = xp.log(dxg / dxa)
        dyt = xp.log(dyg / dya)
        dzt = xp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [xp.cos(rg) - xp.cos(ra), xp.sin(rg) - xp.sin(ra)]
        else:
            rts = [rg - ra]
        cts = [boxes[..., i] - anchors[..., i] for i in range(7, boxes.shape[-1])]
        return xp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], axis=-1)

    def decode(self, box_encodings, anchors):
        """Decode (..., code_size) encodings against (..., 7+C) anchors."""
        xp = _xp(box_encodings)
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]

        xt, yt, zt = box_encodings[..., 0], box_encodings[..., 1], box_encodings[..., 2]
        dxt, dyt, dzt = box_encodings[..., 3], box_encodings[..., 4], box_encodings[..., 5]

        diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = xp.exp(dxt) * dxa
        dyg = xp.exp(dyt) * dya
        dzg = xp.exp(dzt) * dza

        if self.encode_angle_by_sincos:
            cost, sint = box_encodings[..., 6], box_encodings[..., 7]
            rg = xp.arctan2(sint + xp.sin(ra), cost + xp.cos(ra))
            extra_start = 8
        else:
            rg = box_encodings[..., 6] + ra
            extra_start = 7
        cgs = [box_encodings[..., i] + anchors[..., i - extra_start + 7]
               for i in range(extra_start, box_encodings.shape[-1])]
        return xp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)

    # torch-named aliases so reference-call-site shims work unchanged
    encode_torch = encode
    decode_torch = decode


class PreviousResidualDecoder:
    """Decoder for the older (x, y, z, w, l, h, r) encoding (box_coder_utils.py:80-107)."""

    def __init__(self, code_size=7, **kwargs):
        self.code_size = code_size

    @staticmethod
    def decode(box_encodings, anchors):
        xp = _xp(box_encodings)
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xt, yt, zt = box_encodings[..., 0], box_encodings[..., 1], box_encodings[..., 2]
        wt, lt, ht = box_encodings[..., 3], box_encodings[..., 4], box_encodings[..., 5]
        rt = box_encodings[..., 6]

        diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = xp.exp(lt) * dxa
        dyg = xp.exp(wt) * dya
        dzg = xp.exp(ht) * dza
        rg = rt + ra
        cgs = [box_encodings[..., i] + anchors[..., i] for i in range(7, box_encodings.shape[-1])]
        return xp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)

    decode_torch = decode


class PointResidualCoder:
    """Class-mean-size anchored point codec (box_coder_utils.py:144-222)."""

    def __init__(self, code_size=8, use_mean_size=True, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = np.asarray(kwargs['mean_size'], dtype=np.float32)
            assert self.mean_size.min() > 0

    def encode(self, gt_boxes, points, gt_classes=None):
        xp = _xp(gt_boxes)
        gt_dims = xp.clip(gt_boxes[..., 3:6], 1e-5, None)
        xg, yg, zg = gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2]
        dxg, dyg, dzg = gt_dims[..., 0], gt_dims[..., 1], gt_dims[..., 2]
        rg = gt_boxes[..., 6]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]

        if self.use_mean_size:
            mean_size = xp.asarray(self.mean_size)
            point_anchor_size = mean_size[gt_classes - 1]
            dxa, dya, dza = point_anchor_size[..., 0], point_anchor_size[..., 1], point_anchor_size[..., 2]
            diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = xp.log(dxg / dxa)
            dyt = xp.log(dyg / dya)
            dzt = xp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = xp.log(dxg), xp.log(dyg), xp.log(dzg)

        cts = [gt_boxes[..., i] for i in range(7, gt_boxes.shape[-1])]
        return xp.stack([xt, yt, zt, dxt, dyt, dzt, xp.cos(rg), xp.sin(rg), *cts], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xp = _xp(box_encodings)
        xt, yt, zt = box_encodings[..., 0], box_encodings[..., 1], box_encodings[..., 2]
        dxt, dyt, dzt = box_encodings[..., 3], box_encodings[..., 4], box_encodings[..., 5]
        cost, sint = box_encodings[..., 6], box_encodings[..., 7]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]

        if self.use_mean_size:
            mean_size = xp.asarray(self.mean_size)
            point_anchor_size = mean_size[pred_classes - 1]
            dxa, dya, dza = point_anchor_size[..., 0], point_anchor_size[..., 1], point_anchor_size[..., 2]
            diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = xp.exp(dxt) * dxa
            dyg = xp.exp(dyt) * dya
            dzg = xp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = xp.exp(dxt), xp.exp(dyt), xp.exp(dzt)

        rg = xp.arctan2(sint, cost)
        cgs = [box_encodings[..., i] for i in range(8, box_encodings.shape[-1])]
        return xp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)

    encode_torch = encode
    decode_torch = decode
