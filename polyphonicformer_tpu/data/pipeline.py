"""Host-side augmentation + static-shape collation.

reference train pipeline (configs/_base_/datasets/cityscapes_dvps.py:8-21):
  SeqResizeWithDepth (ratio 1.0-2.0 of 1024x2048, keep_ratio; depth values
  DIVIDED by the scale factor, transforms.py:32)
  SeqFlipWithDepth (p=0.5, shared across the clip)
  SeqRandomCropWithDepth (1024x2048 shared crop; clip rejected when no thing
  instance survives in both frames, transforms.py:300-310)
  SeqNormalizeWithDepth + SeqPadWithDepth(divisor 32)

plus the GT prep the reference does on-GPU per step
(polyphonic_former.py:60-94): pad + bilinear-downsample masks to stride 4,
nearest-downsample depth, split thing/stuff.  Here all of it happens on the
host so the device step is pure compute on static shapes.
"""
from __future__ import annotations

import random
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..configs import DataConfig, ModelConfig


def _cv2():
    import cv2

    return cv2


def resize_frame(frame: Dict, ratio: float, max_depth: float = 80.0) -> Dict:
    cv2 = _cv2()
    h, w = frame["img"].shape[:2]
    nh, nw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    out = dict(frame)
    out["img"] = cv2.resize(frame["img"], (nw, nh), interpolation=cv2.INTER_LINEAR)
    if frame["masks"].shape[0] > 0:
        out["masks"] = np.stack([
            cv2.resize(m, (nw, nh), interpolation=cv2.INTER_NEAREST)
            for m in frame["masks"]])
    else:
        out["masks"] = np.zeros((0, nh, nw), np.uint8)
    if frame.get("depth") is not None:
        d = cv2.resize(frame["depth"], (nw, nh), interpolation=cv2.INTER_NEAREST)
        # depth scales inversely with image scale (transforms.py:32)
        out["depth"] = d / ratio
    return out


def flip_frame(frame: Dict) -> Dict:
    # negative-stride views, not copies: every downstream consumer (crop
    # slice, keep-filter, normalize, pad, cv2/index downsample) materializes
    # fresh arrays anyway, so the full-res copy here was pure memcpy waste
    out = dict(frame)
    out["img"] = frame["img"][:, ::-1]
    out["masks"] = frame["masks"][:, :, ::-1]
    if frame.get("depth") is not None:
        out["depth"] = frame["depth"][:, ::-1]
    return out


def crop_frame(frame: Dict, y0: int, x0: int, ch: int, cw: int) -> Optional[Dict]:
    """Crop; drop empty instances; None if no instance survives
    (the reference rejects via empty gt_bboxes, transforms.py:244-248)."""
    out = dict(frame)
    out["img"] = frame["img"][y0:y0 + ch, x0:x0 + cw]
    masks = frame["masks"][:, y0:y0 + ch, x0:x0 + cw]
    keep = masks.any(axis=(1, 2))
    if not keep.any():
        return None
    out["masks"] = masks[keep]
    out["labels"] = frame["labels"][keep]
    out["inst_ids"] = frame["inst_ids"][keep]
    if frame.get("depth") is not None:
        out["depth"] = frame["depth"][y0:y0 + ch, x0:x0 + cw]
    return out


def normalize_image(img: np.ndarray, mean, std) -> np.ndarray:
    # same (x - mean) / std math, one allocation instead of three temporaries
    out = np.subtract(img, np.asarray(mean, np.float32), dtype=np.float32)
    out /= np.asarray(std, np.float32)
    return out


def pad_to(img: np.ndarray, ph: int, pw: int, value=0) -> np.ndarray:
    h, w = img.shape[:2]
    pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad, constant_values=value)


def _downsample_mask_bilinear(mask: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Bilinear downsample matching torch align_corners=False (the model-side
    convention used by the reference for GT masks)."""
    cv2 = _cv2()
    return cv2.resize(mask.astype(np.float32), (ow, oh),
                      interpolation=cv2.INTER_LINEAR)


def _downsample_nearest_torch(x: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """torch mode='nearest' (asymmetric floor) downsample."""
    h, w = x.shape[:2]
    iy = np.clip(np.floor(np.arange(oh) * (h / oh)).astype(np.int64), 0, h - 1)
    ix = np.clip(np.floor(np.arange(ow) * (w / ow)).astype(np.int64), 0, w - 1)
    return x[iy][:, ix]


def frame_to_sample(frame: Dict, model_cfg: ModelConfig, pad_hw: Tuple[int, int]
                    ) -> Dict[str, np.ndarray]:
    """Pad + downsample to stride 4, split thing/stuff, pad to static shapes.

    Returns numpy arrays matching data.structures.GTSample plus the image.
    """
    ph, pw = pad_hw
    stride = model_cfg.mask_assign_stride
    ah, aw = ph // stride, pw // stride
    mt = model_cfg.max_things
    ns = model_cfg.num_stuff_classes
    nt = model_cfg.num_thing_classes

    img = pad_to(frame["img"], ph, pw)

    labels = frame["labels"]
    masks = frame["masks"]
    small = np.zeros((len(masks), ah, aw), np.float32)
    for i, m in enumerate(masks):
        padded = pad_to(m, ph, pw)
        if model_cfg.semantic_kitti:
            # SemKITTI mode: nearest GT downsample (polyphonic_former.py:77-80)
            small[i] = _downsample_nearest_torch(padded.astype(np.float32),
                                                 ah, aw)
        else:
            small[i] = _downsample_mask_bilinear(padded, ah, aw)

    is_thing = labels < nt
    thing_small = small[is_thing]
    thing_labels = labels[is_thing]
    thing_ids = frame["inst_ids"][is_thing]
    if len(thing_small) > mt:
        # capacity overflow: keep the largest instances
        areas = thing_small.sum(axis=(1, 2))
        order = np.argsort(-areas)[:mt]
        thing_small, thing_labels, thing_ids = (
            thing_small[order], thing_labels[order], thing_ids[order])

    n = len(thing_small)
    thing_masks = np.zeros((mt, ah, aw), np.float32)
    thing_masks[:n] = thing_small
    tl = np.full((mt,), -1, np.int32)
    tl[:n] = thing_labels
    ti = np.full((mt,), -1, np.int32)
    ti[:n] = thing_ids
    tv = np.zeros((mt,), bool)
    tv[:n] = True

    stuff_masks = np.zeros((ns, ah, aw), np.float32)
    stuff_valid = np.zeros((ns,), bool)
    for m, lab in zip(small[~is_thing], labels[~is_thing]):
        slot = int(lab) - nt
        stuff_masks[slot] = m
        stuff_valid[slot] = True

    depth = np.zeros((ah, aw), np.float32)
    if frame.get("depth") is not None:
        depth = _downsample_nearest_torch(pad_to(frame["depth"], ph, pw), ah, aw)

    valid = (thing_masks.sum(0) + stuff_masks.sum(0)) > 0

    return dict(
        image=img,
        thing_masks=thing_masks,
        thing_labels=tl,
        thing_valid=tv,
        thing_inst_ids=ti,
        stuff_masks=stuff_masks,
        stuff_valid=stuff_valid,
        depth=depth,
        valid_mask=valid.astype(np.float32),
    )


class TrainPipeline:
    """Full train-time augmentation for a 1- or 2-frame clip."""

    def __init__(self, data_cfg: DataConfig, model_cfg: ModelConfig):
        self.dc = data_cfg
        self.mc = model_cfg

    def __call__(self, frames: List[Dict], rng: random.Random
                 ) -> Optional[List[Dict[str, np.ndarray]]]:
        dc = self.dc
        ratio = rng.uniform(*dc.ratio_range)
        frames = [resize_frame(f, ratio, dc.max_depth) for f in frames]
        if rng.random() < dc.flip_ratio:
            frames = [flip_frame(f) for f in frames]
        ch, cw = dc.img_size
        h, w = frames[0]["img"].shape[:2]
        y0 = rng.randint(0, max(h - ch, 0))
        x0 = rng.randint(0, max(w - cw, 0))
        cropped = []
        for f in frames:
            c = crop_frame(f, y0, x0, ch, cw)
            if c is None:
                return None
            cropped.append(c)
        frames = cropped
        # reject the clip when no thing instance is shared (check_id_match)
        if len(frames) == 2:
            key_things = set(frames[0]["inst_ids"][
                frames[0]["labels"] < self.mc.num_thing_classes].tolist())
            ref_things = set(frames[1]["inst_ids"][
                frames[1]["labels"] < self.mc.num_thing_classes].tolist())
            key_things = {i for i in key_things if i < dc.check_id_match}
            ref_things = {i for i in ref_things if i < dc.check_id_match}
            if not (key_things & ref_things):
                return None
        div = dc.size_divisor
        ph = (ch + div - 1) // div * div
        pw = (cw + div - 1) // div * div
        out = []
        for f in frames:
            f = dict(f)
            if (ph, pw) == (ch, cw):
                # no padding: ship the raw uint8 crop and let the jitted
                # train step normalize ON DEVICE (train/step.py::
                # normalize_uint8_image — same (x-mean)/std math, exact).
                # 4x less shared-memory + host->device traffic and one
                # full-res host pass saved.  Every shipped train crop is
                # divisor-aligned; the padded case keeps the host path
                # because mmdet pads AFTER Normalize (pad value 0 in
                # normalized space), which uint8 cannot represent.
                pass
            else:
                f["img"] = normalize_image(f["img"], dc.mean, dc.std)
            out.append(frame_to_sample(f, self.mc, (ph, pw)))
        return out


def make_test_input(frame: Dict, data_cfg: DataConfig) -> Dict[str, np.ndarray]:
    """Test-time preprocessing: normalize + pad to divisor (no resize at
    scale_factor 1.0, configs/_base_/datasets/cityscapes_dvps.py:23-41)."""
    img = normalize_image(frame["img"], data_cfg.mean, data_cfg.std)
    h, w = img.shape[:2]
    div = data_cfg.size_divisor
    ph = (h + div - 1) // div * div
    pw = (w + div - 1) // div * div
    return dict(image=pad_to(img, ph, pw), ori_hw=(h, w),
                seq_id=frame["seq_id"], img_id=frame["img_id"])
