"""Semantic-map -> instance-mask conversion with thing/stuff relabeling for
COCO / Cityscapes / KITTI-STEP label layouts.

reference: /root/reference/polyphonic/utils.py:4-89 (sem2ins_masks*) — the
utility capability that lets the model train on other DVPS datasets whose
semantic ids are not thing-first.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def sem2ins_masks(sem_seg: np.ndarray, inst_seg: np.ndarray,
                  num_thing_classes: int, thing_ids: Sequence[int],
                  ignore_id: int = 255
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split a (semantic, instance) pair into per-segment binary masks with
    thing-first labels.

    Args:
      sem_seg: (H, W) original semantic ids.
      inst_seg: (H, W) instance ids (0 for stuff).
      thing_ids: original semantic ids that are thing classes, in the order
        they map to [0, num_thing_classes).
      ignore_id: id to drop.
    Returns (masks (N, H, W) uint8, labels (N,), instance_ids (N,)).
    """
    thing_map = {int(t): i for i, t in enumerate(thing_ids)}
    stuff_ids = sorted(set(np.unique(sem_seg).tolist()) - set(thing_map)
                       - {ignore_id})
    stuff_map = {int(s): num_thing_classes + i for i, s in enumerate(stuff_ids)}

    masks, labels, inst_ids = [], [], []
    pan = sem_seg.astype(np.int64) * 100000 + inst_seg.astype(np.int64)
    for pid in np.unique(pan):
        sem = int(pid) // 100000
        if sem == ignore_id:
            continue
        if sem in thing_map:
            label = thing_map[sem]
        else:
            label = stuff_map[sem]
        masks.append((pan == pid).astype(np.uint8))
        labels.append(label)
        inst_ids.append(int(pid))
    if not masks:
        shape = (0,) + sem_seg.shape
        return (np.zeros(shape, np.uint8), np.zeros((0,), np.int64),
                np.zeros((0,), np.int64))
    return np.stack(masks), np.asarray(labels), np.asarray(inst_ids)


# KITTI-STEP / SemKITTI-DVPS layout: 19 Cityscapes classes where things are
# {person=11, rider=12, car=13, truck=14, bus=15, train=16, motorcycle=17,
# bicycle=18} (same trainId layout as Cityscapes).
CITYSCAPES_THING_TRAINIDS = (11, 12, 13, 14, 15, 16, 17, 18)


def sem2ins_masks_cityscapes(sem_seg: np.ndarray, inst_seg: np.ndarray):
    return sem2ins_masks(sem_seg, inst_seg, 8, CITYSCAPES_THING_TRAINIDS)
