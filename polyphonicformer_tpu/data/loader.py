"""Prefetching host input pipeline.

Replaces the reference's torch DataLoader worker processes
(mmdet/datasets/builder.py:86-190) with a thread pool that decodes and
augments clips on the host while the device computes — the standard
overlap pattern for feeding a TPU.  Rejected clips (empty crop / no shared
track id) are resampled like the reference's ``_rand_another``
(datasets/cityscapes_dvps.py:311-316).
"""
from __future__ import annotations

import queue
import random
import threading
from typing import Iterator, Optional

import numpy as np

from ..configs import DataConfig, ModelConfig
from .cityscapes_dvps import CityscapesDVPSDataset
from .pipeline import TrainPipeline
from .structures import GTSample, TrainBatch


def _collate_gt(samples, key_prefix="") -> GTSample:
    def stack(field):
        return np.stack([s[key_prefix + field] if key_prefix else s[field]
                         for s in samples])

    return GTSample(
        thing_masks=stack("thing_masks"),
        thing_labels=stack("thing_labels"),
        thing_valid=stack("thing_valid"),
        thing_inst_ids=stack("thing_inst_ids"),
        stuff_masks=stack("stuff_masks"),
        stuff_valid=stack("stuff_valid"),
        depth=stack("depth"),
        valid_mask=stack("valid_mask"),
    )


class TrainLoader:
    """Infinite shuffled train loader with background workers."""

    def __init__(self, dataset: CityscapesDVPSDataset, data_cfg: DataConfig,
                 model_cfg: ModelConfig, seed: int = 0,
                 num_workers: Optional[int] = None, prefetch: int = 4):
        self.ds = dataset
        self.dc = data_cfg
        self.mc = model_cfg
        self.pipeline = TrainPipeline(data_cfg, model_cfg)
        self.two_frame = bool(data_cfg.ref_seq_index)
        self.num_workers = num_workers or data_cfg.num_workers
        self.prefetch = prefetch
        self.seed = seed
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = []

    def _make_sample(self, rng: random.Random):
        while True:
            idx = rng.randrange(len(self.ds))
            pair = self.ds.get_pair(idx, rng)
            if pair is None:
                continue
            key, ref = pair
            frames = [self.ds.load_frame(key)]
            if self.two_frame:
                if ref is None:
                    continue
                frames.append(self.ds.load_frame(ref))
            out = self.pipeline(frames, rng)
            if out is None:
                continue
            return out

    def _worker(self, wid: int):
        rng = random.Random(self.seed * 100003 + wid)
        while not self._stop.is_set():
            sample = self._make_sample(rng)
            while not self._stop.is_set():
                try:
                    self._queue.put(sample, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def start(self):
        for wid in range(self.num_workers):
            t = threading.Thread(target=self._worker, args=(wid,), daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self):
        self._stop.set()

    def __iter__(self) -> Iterator[TrainBatch]:
        if not self._threads:
            self.start()
        b = self.dc.batch_size
        while True:
            samples = [self._queue.get() for _ in range(b)]
            keys = [s[0] for s in samples]
            image = np.stack([k["image"] for k in keys])
            gt = _collate_gt(keys)
            if self.two_frame:
                refs = [s[1] for s in samples]
                ref_image = np.stack([r["image"] for r in refs])
                ref_gt = _collate_gt(refs)
                yield TrainBatch(image=image, gt=gt, ref_image=ref_image,
                                 ref_gt=ref_gt)
            else:
                yield TrainBatch(image=image, gt=gt)


def synthetic_batch(model_cfg: ModelConfig, batch: int, hw=(256, 512),
                    two_frame: bool = False, seed: int = 0,
                    max_instances: int | None = None) -> TrainBatch:
    """Random but well-formed batch for tests/benchmarks without the dataset.

    max_instances bounds the per-image thing count (default 8, the light
    test density; pass ~24 for Cityscapes-like or ~40 for SemKITTI-like
    density — the Hungarian solver cost scales with the valid GT count).
    """
    rng = np.random.RandomState(seed)
    h, w = hw
    ah, aw = h // model_cfg.mask_assign_stride, w // model_cfg.mask_assign_stride
    mt, ns = model_cfg.max_things, model_cfg.num_stuff_classes

    def one_gt():
        if max_instances is None:
            n = rng.randint(1, min(mt, 8))  # light density (tests)
        else:
            n = rng.randint(max(max_instances // 2, 1),
                            min(mt, max_instances) + 1)
        cy = rng.randint(0, ah, n)
        cx = rng.randint(0, aw, n)
        r = rng.randint(4, max(ah // 3, 5), n)
        yy, xx = np.mgrid[:ah, :aw]
        masks = np.zeros((mt, ah, aw), np.float32)
        for i in range(n):
            masks[i] = ((np.abs(yy - cy[i]) < r[i]) & (np.abs(xx - cx[i]) < r[i]))
        valid = np.zeros(mt, bool)
        valid[:n] = True
        labels = np.where(valid, rng.randint(0, model_cfg.num_thing_classes, mt), -1)
        inst = np.where(valid, rng.randint(0, 100000, mt), -1)
        stuff = (rng.rand(ns, ah, aw) > 0.85).astype(np.float32)
        sv = rng.rand(ns) > 0.4
        stuff *= sv[:, None, None]
        depth = rng.rand(ah, aw).astype(np.float32) * 60 + 1
        vm = ((masks.sum(0) + stuff.sum(0)) > 0).astype(np.float32)
        return dict(thing_masks=masks, thing_labels=labels.astype(np.int32),
                    thing_valid=valid, thing_inst_ids=inst.astype(np.int32),
                    stuff_masks=stuff, stuff_valid=sv, depth=depth,
                    valid_mask=vm)

    gts = [one_gt() for _ in range(batch)]
    image = rng.randn(batch, h, w, 3).astype(np.float32)
    gt = _collate_gt(gts)
    if two_frame:
        ref_gts = [one_gt() for _ in range(batch)]
        # share some instance ids so track targets have positives
        ref_gt = _collate_gt(ref_gts)
        ref_gt = ref_gt.replace(thing_inst_ids=gt.thing_inst_ids)
        return TrainBatch(image=image, gt=gt,
                          ref_image=rng.randn(batch, h, w, 3).astype(np.float32),
                          ref_gt=ref_gt)
    return TrainBatch(image=image, gt=gt)
