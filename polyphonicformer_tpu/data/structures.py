"""Static-shape batch structures.

The reference carries variable-length per-image GT lists
(/root/reference/polyphonic/polyphonic_former.py:64-94); here GT is padded to
fixed capacities so the whole train step stays inside one jitted program:

* thing instances padded to ``max_things`` with a validity mask;
* stuff is keyed by class: slot ``s`` holds the (merged) mask of stuff class
  ``num_things + s`` — stuff classes are unique per image, so this is exact;
* all masks/depth live at the assign resolution (stride 4), downsampled with
  the same interpolation as the reference (bilinear for masks, nearest for
  depth).
"""
from __future__ import annotations

from typing import Optional

import flax
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class GTSample:
    """Per-image (or batched, with a leading axis) ground truth."""

    thing_masks: jax.Array  # (M, h, w) float soft masks at stride 4
    thing_labels: jax.Array  # (M,) int32 in [0, num_things), pad = -1
    thing_valid: jax.Array  # (M,) bool
    thing_inst_ids: jax.Array  # (M,) int32 global instance ids, pad = -1
    stuff_masks: jax.Array  # (S, h, w) float soft masks, slot s = class T+s
    stuff_valid: jax.Array  # (S,) bool
    depth: jax.Array  # (h, w) float32 metric depth at stride 4, 0 = invalid
    valid_mask: jax.Array  # (h, w) float32 union of all GT masks


@flax.struct.dataclass
class TrainBatch:
    image: jax.Array  # (B, H, W, 3) normalized float
    gt: GTSample  # batched
    ref_image: Optional[jax.Array] = None  # (B, H, W, 3) for video training
    ref_gt: Optional[GTSample] = None
