"""Test-only, pure-PyTorch shim of the mmcv 1.3.18 API slice that the
reference PolyphonicFormer exercises (see /root/reference/scripts/docker_env/
Dockerfile:12 for the real dependency).  This exists so the REAL reference
model code (/root/reference/polyphonic/*.py + the vendored mmdet leaf modules
it imports) can be instantiated and run on CPU for numerical parity testing —
it is never shipped, and it implements only behavior the shipped configs hit.

Numeric-fidelity notes per symbol live next to the implementations."""
from .utils import (Config, ConfigDict, Registry, build_from_cfg,
                    digit_version, get_logger, print_log)
from . import ops  # noqa: F401  (`from mmcv import ops` in roi extractors)

__version__ = "1.3.18"


def jit(*args, **kwargs):
    """mmcv custom-op jit decorator: identity (only affects parrots)."""
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def wrap(fn):
        return fn

    return wrap


def is_list_of(seq, expected_type):
    return isinstance(seq, list) and all(
        isinstance(s, expected_type) for s in seq)


def is_tuple_of(seq, expected_type):
    return isinstance(seq, tuple) and all(
        isinstance(s, expected_type) for s in seq)


def concat_list(in_list):
    return list(__import__("itertools").chain(*in_list))


def scandir(dir_path, suffix=None, recursive=False):
    """mmcv.utils.path.scandir slice: non-recursive filename generator
    (the reference eval uses it to list frame dumps,
    polyphonic/apis/video_evaluate.py:46,51)."""
    import os

    assert not recursive, "shim: recursive scandir not needed"
    for entry in os.scandir(dir_path):
        if not entry.is_file():
            continue
        if suffix is None or entry.name.endswith(suffix):
            yield entry.name


def imread(*a, **k):  # only reachable from show_result paths we never call
    raise NotImplementedError("mmcv shim: imread not implemented")


def imwrite(*a, **k):
    raise NotImplementedError("mmcv shim: imwrite not implemented")


def imresize(*a, **k):
    raise NotImplementedError("mmcv shim: imresize not implemented")
