"""Configuration system: YAML configs with ``_BASE_CONFIG_`` inheritance, attribute
access, and dotted-key CLI overrides.

Parity target: /root/reference/pcdet/config.py (global ``cfg``, ``cfg_from_yaml_file``,
``merge_new_config`` at config.py:51-68, ``cfg_from_list`` at config.py:16-48,
``log_config_to_file`` at config.py:7-13). Re-implemented from scratch without the
``easydict`` dependency: :class:`ConfigDict` provides the attribute-style access the
rest of the framework relies on.
"""

from pathlib import Path

import yaml


class ConfigDict(dict):
    """dict subclass with attribute access, recursively converting nested dicts."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = {} if d is None else dict(d)
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _convert(value):
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            return ConfigDict(value)
        if isinstance(value, (list, tuple)):
            return type(value)(ConfigDict._convert(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, ConfigDict._convert(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def copy(self):
        return ConfigDict({k: (v.copy() if isinstance(v, ConfigDict) else v) for k, v in self.items()})


# the global configuration object, mirroring pcdet.config.cfg
import os as _os

cfg = ConfigDict()
cfg.ROOT_DIR = Path(_os.environ.get(
    'HVPR_ROOT_DIR', Path(__file__).resolve().parent.parent))
cfg.LOCAL_RANK = 0


def log_config_to_file(cfg_=None, pre='cfg', logger=None):
    cfg_ = cfg if cfg_ is None else cfg_
    for key, val in cfg_.items():
        if isinstance(val, ConfigDict):
            logger.info('----------- %s.%s -----------', pre, key)
            log_config_to_file(val, pre=f'{pre}.{key}', logger=logger)
        else:
            logger.info('%s.%s: %s', pre, key, val)


def merge_new_config(config, new_config):
    """Recursively merge ``new_config`` into ``config``.

    Supports single-level `_BASE_CONFIG_` file inheritance (reference config.py:51-58):
    the base YAML is loaded first and the new keys override it.
    """
    if '_BASE_CONFIG_' in new_config:
        with open(new_config['_BASE_CONFIG_'], 'r') as f:
            base_config = yaml.safe_load(f)
        config.update(ConfigDict(base_config))

    for key, val in new_config.items():
        if key == '_BASE_CONFIG_':
            continue
        if not isinstance(val, dict):
            config[key] = val
            continue
        if key not in config or not isinstance(config[key], dict):
            config[key] = ConfigDict()
        merge_new_config(config[key], val)
    return config


def cfg_from_yaml_file(cfg_file, config=None):
    """Load a YAML file into ``config`` (the global ``cfg`` by default)."""
    config = cfg if config is None else config
    with open(cfg_file, 'r') as f:
        new_config = yaml.safe_load(f)
    merge_new_config(config=config, new_config=new_config)
    return config


def cfg_from_list(cfg_list, config=None):
    """Set config keys from a ``[key, value, key, value, ...]`` list of dotted keys.

    Values are parsed as Python literals when possible, and coerced to the type of the
    existing config entry (reference config.py:16-48).
    """
    import ast

    config = cfg if config is None else config
    assert len(cfg_list) % 2 == 0, cfg_list
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = full_key.split('.')
        d = config
        for subkey in key_list[:-1]:
            assert subkey in d, f'NotFoundKey: {subkey}'
            d = d[subkey]
        subkey = key_list[-1]
        assert subkey in d, f'NotFoundKey: {subkey}'
        try:
            value = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            value = v

        if isinstance(value, dict):
            # dict-valued overrides merge into the existing subtree
            merge_new_config(d[subkey], ConfigDict(value))
        else:
            if d[subkey] is not None and not isinstance(d[subkey], type(value)) \
                    and not (isinstance(d[subkey], float) and isinstance(value, int)):
                assert isinstance(value, type(d[subkey])), \
                    f'type {type(value)} does not match original type {type(d[subkey])}'
            d[subkey] = value
    return config
