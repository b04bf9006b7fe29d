"""mmcv.utils.progressbar shim: serial in-process "pool" + silent bar.

The reference's DVPQ aggregation runs its clip evaluations through
``init_pool(128)`` + ``Pool.starmap`` (polyphonic/apis/utils.py:26-44,
mmcv/utils/progressbar.py).  For oracle testing we only need the exact
same call graph and result ordering, not 128 processes — ``starmap``
runs serially, preserving mmcv's ordered-result semantics.
"""
from __future__ import annotations

import sys
from itertools import starmap as _starmap


class ProgressBar:
    """Silent stand-in: same constructor/update surface, no terminal IO."""

    def __init__(self, task_num=0, bar_width=50, start=True, file=sys.stdout):
        self.task_num = task_num
        self.bar_width = bar_width
        self.file = file
        self.completed = 0

    def start(self):
        self.completed = 0

    def update(self, num_tasks=1):
        self.completed += num_tasks


class _SerialPool:
    """multiprocessing.Pool surface over in-process execution (ordered)."""

    def starmap(self, func, tasks, chunksize=1):
        return list(_starmap(func, tasks))

    def map(self, func, tasks, chunksize=1):
        return [func(t) for t in tasks]

    def close(self):
        pass

    def join(self):
        pass


def init_pool(process_num, initializer=None, initargs=None):
    if initializer is not None:
        initializer(*(initargs or ()))
    return _SerialPool()
