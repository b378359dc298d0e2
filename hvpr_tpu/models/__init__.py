"""Network factory and runtime glue.

Parity target: the missing ``pcdet/models/__init__.py`` of the reference
snapshot (imported by tools/train.py:15, tools/test.py:16, tools/demo.py:11):
``build_network``, ``load_data_to_gpu`` and ``model_fn_decorator`` — the HVPR
variant of model_fn returns 4 values (loss, tb_dict, disp_dict, items), see
train_utils.py:38.

TPU-native: ``Network`` wraps the pure flax module with its variables and
jitted apply functions; "load to GPU" becomes a device_put of the fixed-shape
numpy batch.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .detectors import build_detector
from .detectors.detector3d_template import post_processing

_ARRAY_KEYS = (
    'points', 'point_valid_mask', 'voxels', 'voxel_num_points', 'voxel_coords',
    'voxel_mask', 'gt_boxes',
)


def load_data_to_gpu(batch_dict):
    """Move the numpy batch to the accelerator (host->device copy)."""
    out = {}
    for k, v in batch_dict.items():
        if isinstance(v, np.ndarray) and k in _ARRAY_KEYS:
            out[k] = jnp.asarray(v)
        else:
            out[k] = v
    return out


class Network:
    """Stateful facade over the functional flax detector.

    Holds ``variables = {'params', 'batch_stats'}`` and exposes jitted train /
    eval entry points. The flax module itself stays pure.
    """

    def __init__(self, module, post_cfg=None, num_class=1):
        self.module = module
        self.post_cfg = post_cfg
        self.num_class = num_class
        self.variables = None
        self._eval_fn = None

    # -------------------------------------------------------------- lifecycle

    def init(self, rng, example_batch, train=True):
        """Initialize parameters (train path creates the full tree).

        Jitted: flax's eager init dispatches every primitive separately, which
        is pathologically slow through a remote-device transport (~10 min for
        the full model vs ~1 compile).
        """
        init_fn = jax.jit(self.module.init, static_argnames=('train',))
        self.variables = init_fn(rng, example_batch, train=train)
        return self.variables

    # ------------------------------------------------------------------ train

    def train_forward(self, variables, batch_dict):
        """Pure apply returning (loss, (tb_dict, new_batch_stats)).

        Always runs the train path: losses only exist there (the heads build
        them from the dual-path predictions), so a ``train`` toggle here
        would be a lie — use :meth:`eval_forward` for eval semantics.
        """
        out, mutated = self.module.apply(
            variables, batch_dict, train=True, mutable=['batch_stats'])
        return out['loss'], (out['tb_dict'], mutated['batch_stats'])

    # ------------------------------------------------------------------- eval

    def _build_eval_fn(self):
        post_cfg = self.post_cfg
        num_class = self.num_class

        @jax.jit
        def eval_fn(variables, batch_dict):
            out = self.module.apply(variables, batch_dict, train=False)
            res = post_processing(out, post_cfg, num_class)
            return res

        return eval_fn

    def eval_forward(self, batch_dict):
        """Jitted inference + post-processing on a device batch."""
        if self._eval_fn is None:
            self._eval_fn = self._build_eval_fn()
        return self._eval_fn(self.variables, batch_dict)

    # ------------------------------------------------------------ checkpoints

    def state_dict(self):
        return self.variables

    def load_state_dict(self, variables, strict=False):
        """Shape-checked partial update (detector3d_template.py:332-346 parity)."""
        import flax
        if self.variables is None:
            self.variables = variables
            return []
        cur = flax.traverse_util.flatten_dict(self.variables)
        new = flax.traverse_util.flatten_dict(variables)
        skipped = []
        for k, v in new.items():
            if k in cur and cur[k].shape == jnp.shape(v):
                cur[k] = jnp.asarray(v)
            else:
                skipped.append('/'.join(str(x) for x in k))
        self.variables = flax.traverse_util.unflatten_dict(cur)
        if strict and skipped:
            raise ValueError(f'shape-mismatched keys: {skipped}')
        return skipped


def build_network(model_cfg, num_class, dataset):
    """Build a Network from config (reference build_network contract)."""
    module = build_detector(model_cfg, num_class, dataset)
    return Network(module,
                   post_cfg=model_cfg.get('POST_PROCESSING'),
                   num_class=num_class)


def model_fn_decorator():
    """Training closure matching the reference contract: returns
    (loss, tb_dict, disp_dict, items) — items are the memory rows."""

    def model_func(model, batch_dict):
        batch = load_data_to_gpu(batch_dict)
        loss, (tb_dict, _) = model.train_forward(model.variables, batch)
        disp_dict = {'loss': float(loss)}
        items = model.variables['params']
        for key in ('map_to_bev', 'memory'):
            items = items.get(key, {}) if isinstance(items, dict) else {}
        items = items.get('weight') if isinstance(items, dict) else None
        return loss, tb_dict, disp_dict, items

    return model_func
