"""Height compression for 3D-conv backbones (flax).

Parity target: /root/reference/pcdet/models/backbones_2d/map_to_bev/
height_compression.py:10-26 — flattens the z axis of a dense 3D feature
volume into channels for the 2D BEV backbone. The reference consumes a
spconv sparse tensor; here the 3D backbones produce dense (B, D, H, W, C)
volumes (NDHWC), so this is a reshape.
"""

import flax.linen as nn


class HeightCompression(nn.Module):
    model_cfg: dict
    grid_size: tuple = None

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict['encoded_spconv_tensor']          # (B, D, H, W, C)
        b, d, h, w, c = x.shape
        batch_dict['spatial_features'] = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)
        batch_dict['spatial_features_stride'] = batch_dict.get('encoded_spconv_tensor_stride', 8)
        return batch_dict
