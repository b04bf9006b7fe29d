"""AOT serving export: seal a compiled serving program into a deployable
artifact with ``jax.export`` (StableHLO + TPU custom calls), loadable and
runnable WITHOUT this package's model-building code.

The reference's deployment story is "load the .pth inside the same mmdet
codebase" (/root/reference/tools/test_video.py:204-228); a TPU-native
framework ships a sealed, versioned program instead: trace once, serialize,
serve anywhere with a matching backend.  Weights stay OUT of the artifact —
the exported function takes ``variables`` as its first argument, so one
artifact serves every checkpoint of the same architecture, and the artifact
stays small (StableHLO only, no baked-in constants).

Modes (matching infer/pipeline.py):
  image : fn(variables, image[1,H,W,3])              -> image-mode outputs
  frame : fn(variables, image[1,H,W,3], tracker_state, frame_id)
          -> (FrameOutput, tracker_state)  — streaming video serving
  clip  : fn(variables, images[T,H,W,3], tracker_state, first_frame_id)
          -> (ClipOutput, tracker_state)   — offline / batch serving

Usage:
  python -m polyphonicformer_tpu.tools.export --mode clip --hw 1024 2048 \
      --clip-len 32 --bf16 --checkpoint vars.pkl --out serving_clip.jaxexp
Load side (no model code needed):
  from polyphonicformer_tpu.tools.export import load_serving
  fn = load_serving("serving_clip.jaxexp")
  outs, state = fn(variables, images, state, frame_id)
"""
from __future__ import annotations

import argparse
import pickle
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _shape_of(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        tree)


_SER_REGISTERED = False


def _register_export_types() -> None:
    """Register pytree-serialization for the custom output containers.

    ``jax.export`` serializes the in/out PyTreeDefs; custom node types
    (our NamedTuple outputs and the flax-struct TrackerState) must be
    registered on BOTH the export and the load side, so both entry points
    call this.  Idempotent.
    """
    global _SER_REGISTERED
    if _SER_REGISTERED:
        return
    import pickle as _pkl

    from ..infer.panoptic import PanopticResult
    from ..infer.pipeline import ClipOutput, FrameOutput
    from ..infer.tracker import TrackerState

    for nt in (PanopticResult, FrameOutput, ClipOutput):
        try:
            jax_export.register_namedtuple_serialization(
                nt, serialized_name=f"polyphonicformer_tpu.{nt.__name__}")
        except ValueError:
            pass  # another caller registered it already
    try:
        jax_export.register_pytree_node_serialization(
            TrackerState,
            serialized_name="polyphonicformer_tpu.TrackerState",
            serialize_auxdata=_pkl.dumps,
            deserialize_auxdata=_pkl.loads)
    except ValueError:
        pass
    _SER_REGISTERED = True


def build_serving_fn(model, cfg, mode: str, out_hw: Tuple[int, int],
                     bf16: bool = False):
    """The jitted serving callable for ``mode`` (image|frame|clip)."""
    from ..infer.pipeline import (make_clip_step, make_image_step,
                                  make_video_step)

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    maker = {"image": make_image_step, "frame": make_video_step,
             "clip": make_clip_step}[mode]
    return maker(model, cfg, tuple(out_hw), compute_dtype=dtype,
                 fusion_dtype=dtype)


def export_serving(model, cfg, variables, mode: str, out_hw: Tuple[int, int],
                   clip_len: int = 8, bf16: bool = False) -> bytes:
    """Trace + lower the serving program and return the serialized artifact.

    The export is shape-specialized (static shapes are the TPU contract);
    variables enter as arguments, not baked constants.
    """
    from ..infer.pipeline import init_tracker_state

    _register_export_types()
    h, w = out_hw
    fn = build_serving_fn(model, cfg, mode, out_hw, bf16=bf16)
    var_s = _shape_of(variables)
    img1 = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    fid = jax.ShapeDtypeStruct((), jnp.int32)
    if mode == "image":
        args = (var_s, img1)
    else:
        state = _shape_of(init_tracker_state(cfg.tracker,
                                             cfg.track_head.embed_channels))
        if mode == "frame":
            args = (var_s, img1, state, fid)
        elif mode == "clip":
            imgs = jax.ShapeDtypeStruct((clip_len, h, w, 3), jnp.float32)
            args = (var_s, imgs, state, fid)
        else:
            raise ValueError(f"unknown export mode: {mode}")
    exported = jax_export.export(fn)(*args)
    return exported.serialize()


def load_serving(path_or_bytes):
    """Deserialize an exported serving artifact into a callable.

    The returned callable runs under jit (exported programs are closed
    StableHLO); it needs only jax + a backend matching the export platform,
    not this package's model code.
    """
    _register_export_types()
    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exported = jax_export.deserialize(blob)
    return jax.jit(exported.call)


def main(argv: Optional[list] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--mode", choices=["image", "frame", "clip"],
                    default="clip")
    ap.add_argument("--hw", type=int, nargs=2, default=[1024, 2048])
    ap.add_argument("--clip-len", type=int, default=8)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 serving fast path (Pallas fusion kernels)")
    ap.add_argument("--preset", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="converted .pkl variables (optional — the artifact "
                         "is weight-free either way; this only validates "
                         "shapes against a real checkpoint)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    from ..configs import ModelConfig, get_preset
    from ..models import PolyphonicFormer

    if args.preset:
        cfg = get_preset(args.preset).model
    else:
        cfg = ModelConfig(with_track=args.mode != "image")
    model = PolyphonicFormer(cfg)
    if args.checkpoint:
        with open(args.checkpoint, "rb") as f:
            variables = pickle.load(f)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 128, 3), jnp.float32),
                               method=PolyphonicFormer.init_all)

    blob = export_serving(model, cfg, variables, args.mode, tuple(args.hw),
                          clip_len=args.clip_len, bf16=args.bf16)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}: mode={args.mode} hw={tuple(args.hw)} "
          f"bf16={args.bf16} bytes={len(blob)}")


if __name__ == "__main__":
    main()
