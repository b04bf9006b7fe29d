"""Render the final per-pixel maps from the fusion argmax in one VMEM pass.

The panoptic outputs are table lookups through the (H, W) winning-candidate
map: ``semantic = labels[pix]``, ``panoptic = seg_ids[pix]``,
``depth = keep[pix] ? depth_sel : depth_basic``, ``track = ids[pix]``.
XLA lowers each of those as a per-pixel dynamic gather — measured ~17ms
PER MAP at 1024x2048 on v5e (the single largest cost in the whole video
frame).  This kernel replaces them with two one-hot contractions over the
candidate axis:

  code[k] = keep[k] * 2^13 + seg[k] * 2^5 + label[k]   (exact in f32)
  track[k]                                              (unbounded ids)

so all four maps cost ~2 VPU passes over (K, TR, W) per tile instead of
four serial gathers.  Replaces the maps construction the reference does
with torch advanced indexing (kernel_update.py:472-517).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SEG_SHIFT = 32  # labels < 32 (19 classes + void)
_KEEP_SHIFT = 32 * 256  # seg ids < 256 (K <= 128 + 1)


def _kernel(pix_ref, dep_ref, db_ref, code3_ref, trk3_ref,
            sem_ref, pan_ref, depth_ref, track_ref, *, num_classes: int):
    pa = pix_ref[:]  # (TR, W) int32
    k = code3_ref.shape[0]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (k, 1, 1), 0)
    oh = (kidx == pa[None]).astype(jnp.float32)  # (K, TR, W)

    code_px = (oh * code3_ref[:]).sum(axis=0)  # (TR, W) f32, exact ints
    trk_px = (oh * trk3_ref[:]).sum(axis=0)

    keep_px = code_px >= _KEEP_SHIFT
    rem = code_px - jnp.where(keep_px, float(_KEEP_SHIFT), 0.0)
    seg_px = jnp.floor(rem / _SEG_SHIFT)
    lab_px = rem - seg_px * _SEG_SHIFT

    sem_ref[:] = jnp.where(keep_px, lab_px,
                           float(num_classes)).astype(jnp.int32)
    pan_ref[:] = jnp.where(keep_px, seg_px, 0.0).astype(jnp.int32)
    depth_ref[:] = jnp.where(keep_px, dep_ref[:], db_ref[:])
    track_ref[:] = trk_px.astype(jnp.int32)


def render_maps(pix: jax.Array, depth_sel: jax.Array, depth_basic: jax.Array,
                labels: jax.Array, seg_ids: jax.Array, keep: jax.Array,
                track_ids: jax.Array, num_classes: int,
                interpret: bool = False):
    """pix: (H, W) int32 winning candidate; depth_sel/depth_basic: (H, W)
    f32; labels/seg_ids/track_ids: (K,) int32; keep: (K,) bool.
    Returns (semantic i32, panoptic i32, depth f32, track i32), all (H, W).
    Non-kept pixels: semantic=num_classes, panoptic=0, depth=depth_basic.
    track_ids must already encode its own gating (0 for untracked)."""
    h, w = pix.shape
    kk = labels.shape[0]
    kpad = (kk + 7) // 8 * 8
    tr = 8
    while h % tr:
        tr //= 2

    assert num_classes < _SEG_SHIFT and kk + 1 < 256, (num_classes, kk)
    code = (keep.astype(jnp.float32) * _KEEP_SHIFT
            + seg_ids.astype(jnp.float32) * _SEG_SHIFT
            + labels.astype(jnp.float32))

    def vec3(v):
        v = jnp.pad(v.astype(jnp.float32), (0, kpad - kk))
        return jnp.broadcast_to(v[:, None, None], (kpad, 1, w))

    code3 = vec3(code)
    trk3 = vec3(track_ids.astype(jnp.float32))

    row = pl.BlockSpec((tr, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((kpad, 1, w), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    sem, pan, dep, trk = pl.pallas_call(
        functools.partial(_kernel, num_classes=num_classes),
        grid=(h // tr,),
        in_specs=[row, row, row, vec_spec, vec_spec],
        out_specs=(row, row, row, row),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(pix, depth_sel, depth_basic, code3, trk3)
    return sem, pan, dep, trk
