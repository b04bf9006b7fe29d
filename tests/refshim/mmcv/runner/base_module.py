"""mmcv/runner/base_module.py shim (mmdet transformer.py:16 import path)."""
from . import BaseModule, ModuleList, Sequential  # noqa: F401
