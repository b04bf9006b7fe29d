"""mmcv.utils shim: Registry/build_from_cfg/ConfigDict and logging helpers.

Semantics follow mmcv 1.3.18 (mmcv/utils/registry.py, mmcv/utils/config.py)
for the features the reference code uses: dict-based configs with a ``type``
key, decorator registration, and parent-registry fallback."""
from __future__ import annotations

import inspect
import logging

import torch

TORCH_VERSION = torch.__version__

logger_initialized = {}


def digit_version(version_str, length=4):
    import re

    digits = []
    for x in version_str.split("."):
        m = re.match(r"^(\d+)", x)
        if m:
            digits.append(int(m.group(1)))
        if not x.isdigit():
            break
    digits += [0] * (length - len(digits))
    return tuple(digits[:length])


class ConfigDict(dict):
    """addict-style dict with attribute access (mmcv ConfigDict)."""

    def __getattr__(self, name):
        try:
            value = self[name]
        except KeyError:
            raise AttributeError(name)
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            value = ConfigDict(value)
            self[name] = value
        return value

    def __setattr__(self, name, value):
        self[name] = value

    def copy(self):
        return ConfigDict(dict.copy(self))


class Config:
    """Tiny stand-in: wraps a plain dict; no file loading / _base_ merge
    (tests construct config dicts in Python directly)."""

    def __init__(self, cfg_dict=None):
        object.__setattr__(self, "_cfg_dict", ConfigDict(cfg_dict or {}))

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "_cfg_dict"), name)

    def __getitem__(self, key):
        return self._cfg_dict[key]


def get_logger(name, log_file=None, log_level=logging.INFO, file_mode="w"):
    logger = logging.getLogger(name)
    if name not in logger_initialized:
        logger.setLevel(log_level)
        logger_initialized[name] = True
    return logger


def print_log(msg, logger=None, level=logging.INFO):
    if logger is None:
        print(msg)
    elif isinstance(logger, logging.Logger):
        logger.log(level, msg)
    elif logger != "silent":
        get_logger(str(logger)).log(level, msg)


def build_from_cfg(cfg, registry, default_args=None):
    """mmcv/utils/registry.py:build_from_cfg — dict with 'type' -> instance."""
    if not isinstance(cfg, dict):
        raise TypeError(f"cfg must be a dict, got {type(cfg)}")
    if "type" not in cfg:
        if default_args is None or "type" not in default_args:
            raise KeyError('`cfg` or `default_args` must contain "type"')
    args = cfg.copy()
    if default_args is not None:
        for name, value in default_args.items():
            args.setdefault(name, value)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not in the {registry.name} registry")
    elif inspect.isclass(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be a str or class, got {type(obj_type)}")
    return obj_cls(**args)


class Registry:
    def __init__(self, name, build_func=None, parent=None, scope=None):
        self.name = name
        self._module_dict = {}
        self.parent = parent
        self.children = {}
        self.build_func = build_func or (
            parent.build_func if parent is not None else build_from_cfg)
        if parent is not None:
            parent.children[name] = self

    def get(self, key):
        if key in self._module_dict:
            return self._module_dict[key]
        if self.parent is not None:
            return self.parent.get(key)
        # fall through to children (mmcv scope search simplified)
        for child in self.children.values():
            got = child._module_dict.get(key)
            if got is not None:
                return got
        return None

    def build(self, cfg, *args, **kwargs):
        return self.build_func(cfg, self, *args, **kwargs)

    def _register(self, cls, name=None, force=False):
        names = [name] if isinstance(name, str) else (name or [cls.__name__])
        for n in names:
            if not force and n in self._module_dict:
                raise KeyError(f"{n} already registered in {self.name}")
            self._module_dict[n] = cls
        return cls

    def register_module(self, name=None, force=False, module=None):
        if module is not None:
            return self._register(module, name=name, force=force)

        def _wrap(cls):
            return self._register(cls, name=name, force=force)

        return _wrap


def to_2tuple(x):
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return (x, x)
