"""Convert reference PyTorch checkpoints (polyphonic_r50_{image,video}.pth)
into this framework's parameter tree.

Every flax parameter path maps deterministically onto one torch state_dict
key of the reference model (module layout documented per-module in
models/*.py).  Layout transforms:
  conv weight   (O, I, kh, kw) -> (kh, kw, I, O)
  linear weight (O, I)         -> (I, O)
  LN/GN weight                  -> scale
  BN running stats              -> 'batch_stats' collection (FrozenBatchNorm)
Special weights-as-queries params:
  rpn_head.init_kernels.weight      (100, 256, 1, 1) -> (100, 256)
  rpn_head.conv_seg.weight          (19, 256, 1, 1)  -> (19, 256)
  rpn_head.conv_direct_depth.weight (1, 256, 1, 1)   -> (1, 256)

Run with ``--self-test`` to validate the mapping against a synthetic
state_dict generated from the flax tree (no checkpoint download needed in
this environment).
"""
from __future__ import annotations

import argparse
import pickle
from typing import Dict, Tuple

import numpy as np

_STAGE_BLOCKS = {"resnet50": (3, 4, 6, 3)}
# (embed_dim ignored here; only depths matter for key layout)
_SWIN_DEPTHS = {"swin_tiny": (2, 2, 6, 2), "swin_large": (2, 2, 18, 2)}


def _convnormact(torch_prefix: str, has_gn: bool = True):
    """Mapping entries for a ConvNormAct flax module."""
    out = {"conv/kernel": (f"{torch_prefix}.conv.weight", "conv")}
    if has_gn:
        out["gn/scale"] = (f"{torch_prefix}.gn.weight", "copy")
        out["gn/bias"] = (f"{torch_prefix}.gn.bias", "copy")
    else:
        out["conv/bias"] = (f"{torch_prefix}.conv.bias", "copy")
    return out


def _prefix(entries: Dict, flax_prefix: str) -> Dict:
    return {f"{flax_prefix}/{k}": v for k, v in entries.items()}


def _linear(flax_path: str, torch_prefix: str, bias: bool = True) -> Dict:
    out = {f"{flax_path}/kernel": (f"{torch_prefix}.weight", "linear")}
    if bias:
        out[f"{flax_path}/bias"] = (f"{torch_prefix}.bias", "copy")
    return out


def _ln(flax_path: str, torch_prefix: str) -> Dict:
    return {f"{flax_path}/scale": (f"{torch_prefix}.weight", "copy"),
            f"{flax_path}/bias": (f"{torch_prefix}.bias", "copy")}


def _frozen_bn(flax_path: str, torch_prefix: str) -> Dict:
    """Returns (params entries, batch_stats entries) merged; stats prefixed."""
    return {
        f"{flax_path}/scale": (f"{torch_prefix}.weight", "copy"),
        f"{flax_path}/bias": (f"{torch_prefix}.bias", "copy"),
        f"BATCHSTATS::{flax_path}/mean": (f"{torch_prefix}.running_mean", "copy"),
        f"BATCHSTATS::{flax_path}/var": (f"{torch_prefix}.running_var", "copy"),
    }


def _swin_mapping(depths) -> Dict[str, Tuple[str, str]]:
    """Swin backbone mapping, mmdet state-dict layout
    (/root/reference/mmdet/models/backbones/swin.py:449-521: stages.{s}
    .blocks.{b}.{norm1,attn.w_msa,norm2,ffn}, .downsample, out norm{i};
    PatchEmbed/PatchMerging: mmdet/models/utils/transformer.py:198-338).

    The mmdet relative_position_index (double_step_seq + flip,
    swin.py:64-69) expands to the standard (dy+Wh-1)*(2Ww-1)+(dx+Ww-1)
    formula our models/swin.py uses, so the bias table copies verbatim.
    PatchMerging samples 2x2 patches with nn.Unfold (channel-major
    (C, ph, pw) input order); our NHWC merge flattens (ph, pw, C), hence
    the chw->hwc reorder on the reduction weight and the pre-norm vector.
    """
    m: Dict[str, Tuple[str, str]] = {}
    m["backbone/patch_embed/kernel"] = (
        "backbone.patch_embed.projection.weight", "conv")
    m["backbone/patch_embed/bias"] = (
        "backbone.patch_embed.projection.bias", "copy")
    m.update(_ln("backbone/patch_norm", "backbone.patch_embed.norm"))
    for s, depth_s in enumerate(depths):
        for b in range(depth_s):
            fp = f"backbone/stage{s}_block{b}"
            tp = f"backbone.stages.{s}.blocks.{b}"
            m.update(_ln(f"{fp}/norm1", f"{tp}.norm1"))
            m.update(_linear(f"{fp}/attn/qkv", f"{tp}.attn.w_msa.qkv"))
            m.update(_linear(f"{fp}/attn/proj", f"{tp}.attn.w_msa.proj"))
            m[f"{fp}/attn/relative_position_bias_table"] = (
                f"{tp}.attn.w_msa.relative_position_bias_table", "copy")
            m.update(_ln(f"{fp}/norm2", f"{tp}.norm2"))
            m.update(_linear(f"{fp}/mlp_fc1", f"{tp}.ffn.layers.0.0"))
            m.update(_linear(f"{fp}/mlp_fc2", f"{tp}.ffn.layers.1"))
        if s < len(depths) - 1:
            dp = f"backbone.stages.{s}.downsample"
            m[f"backbone/merge{s}/norm/scale"] = (f"{dp}.norm.weight",
                                                  "vec_chw2hwc_2")
            m[f"backbone/merge{s}/norm/bias"] = (f"{dp}.norm.bias",
                                                 "vec_chw2hwc_2")
            m[f"backbone/merge{s}/reduction/kernel"] = (
                f"{dp}.reduction.weight", "linear_chw2hwc_2")
        m.update(_ln(f"backbone/out_norm{s}", f"backbone.norm{s}"))
    return m


def build_param_mapping(num_stages: int = 3, depth: str = "resnet50",
                        with_track: bool = False,
                        num_cls_fcs: int = 1, num_mask_fcs: int = 1
                        ) -> Dict[str, Tuple[str, str]]:
    """flax path ('a/b/c', with BATCHSTATS:: prefix for the stats collection)
    -> (torch state_dict key, transform)."""
    m: Dict[str, Tuple[str, str]] = {}

    # ---- backbone ------------------------------------------------------
    if depth in _SWIN_DEPTHS:
        m.update(_swin_mapping(_SWIN_DEPTHS[depth]))
    elif depth not in _STAGE_BLOCKS:
        raise ValueError(
            f"unknown backbone {depth!r}; converter supports "
            f"{sorted(_STAGE_BLOCKS) + sorted(_SWIN_DEPTHS)}")
    else:
        m["backbone/conv1/kernel"] = ("backbone.conv1.weight", "conv")
        m.update(_frozen_bn("backbone/bn1", "backbone.bn1"))
        for s, blocks in enumerate(_STAGE_BLOCKS[depth]):
            for b in range(blocks):
                fp = f"backbone/layer{s + 1}_{b}"
                tp = f"backbone.layer{s + 1}.{b}"
                for c in (1, 2, 3):
                    m[f"{fp}/conv{c}/kernel"] = (f"{tp}.conv{c}.weight", "conv")
                    m.update(_frozen_bn(f"{fp}/bn{c}", f"{tp}.bn{c}"))
                if b == 0:
                    m[f"{fp}/downsample_conv/kernel"] = (
                        f"{tp}.downsample.0.weight", "conv")
                    m.update(_frozen_bn(f"{fp}/downsample_bn",
                                        f"{tp}.downsample.1"))

    # ---- neck ------------------------------------------------------------
    for i in range(4):
        m[f"neck/lateral_{i}/kernel"] = (f"neck.lateral_convs.{i}.conv.weight", "conv")
        m[f"neck/lateral_{i}/bias"] = (f"neck.lateral_convs.{i}.conv.bias", "copy")
        m[f"neck/fpn_{i}/kernel"] = (f"neck.fpn_convs.{i}.conv.weight", "conv")
        m[f"neck/fpn_{i}/bias"] = (f"neck.fpn_convs.{i}.conv.bias", "copy")

    # ---- rpn head / semantic fpn ------------------------------------------
    sf = "rpn_head/localization_fpn"
    tsf = "rpn_head.localization_fpn"
    # tower convs: flax lvl{i}_conv{j} <-> torch convs_all_levels.{i}.conv{j}
    # (level 0 uses torch index conv0 despite being a stride-2 conv)
    tower = {0: [0], 1: [0], 2: [0, 1], 3: [0, 1, 2]}
    for lvl, convs in tower.items():
        for j in convs:
            m.update(_prefix(
                _convnormact(f"{tsf}.convs_all_levels.{lvl}.conv{j}"),
                f"{sf}/lvl{lvl}_conv{j}"))
    m.update(_prefix(_convnormact(f"{tsf}.conv_pred"), f"{sf}/conv_pred"))
    for i in range(2):
        m.update(_prefix(_convnormact(f"{tsf}.aux_convs.{i}"), f"{sf}/aux_conv{i}"))

    m.update(_prefix(_convnormact("rpn_head.loc_convs.0"), "rpn_head/loc_conv0"))
    m.update(_prefix(_convnormact("rpn_head.seg_convs.0"), "rpn_head/seg_conv0"))
    m.update(_prefix(_convnormact("rpn_head.depth_convs.0"), "rpn_head/depth_conv0"))
    m["rpn_head/init_kernels"] = ("rpn_head.init_kernels.weight", "squeeze11")
    m["rpn_head/conv_seg_weight"] = ("rpn_head.conv_seg.weight", "squeeze11")
    m["rpn_head/conv_seg_bias"] = ("rpn_head.conv_seg.bias", "copy")
    m["rpn_head/conv_direct_depth_weight"] = (
        "rpn_head.conv_direct_depth.weight", "squeeze11")
    m["rpn_head/conv_direct_depth_bias"] = (
        "rpn_head.conv_direct_depth.bias", "copy")

    # ---- kernel update heads ----------------------------------------------
    for s in range(num_stages):
        fp = f"mask_head_{s}"
        tp = f"roi_head.mask_head.{s}"
        m.update(_linear(f"{fp}/feat_transform", f"{tp}.feat_transform.conv",
                         bias=True))
        m[f"{fp}/feat_transform/kernel"] = (f"{tp}.feat_transform.conv.weight", "conv")
        m[f"{fp}/feat_transform/bias"] = (f"{tp}.feat_transform.conv.bias", "copy")
        m[f"{fp}/feat_depth_transform/kernel"] = (
            f"{tp}.feat_depth_transform.conv.weight", "conv")
        m[f"{fp}/feat_depth_transform/bias"] = (
            f"{tp}.feat_depth_transform.conv.bias", "copy")
        for ku, tku in (("kernel_update_conv", "kernel_update_conv"),
                        ("kernel_update_conv_depth", "kernel_update_conv_depth")):
            for lin in ("dynamic_layer", "input_layer", "input_gate",
                        "update_gate", "fc_layer"):
                m.update(_linear(f"{fp}/{ku}/{lin}", f"{tp}.{tku}.{lin}"))
            for ln in ("norm_in", "norm_out", "input_norm_in",
                       "input_norm_out", "fc_norm"):
                m.update(_ln(f"{fp}/{ku}/{ln}", f"{tp}.{tku}.{ln}"))
        for att, tatt in (("attention", "attention"),
                          ("attention_depth", "attention_depth")):
            m[f"{fp}/{att}/in_proj_weight"] = (f"{tp}.{tatt}.attn.in_proj_weight", "copy")
            m[f"{fp}/{att}/in_proj_bias"] = (f"{tp}.{tatt}.attn.in_proj_bias", "copy")
            m[f"{fp}/{att}/out_proj_weight"] = (f"{tp}.{tatt}.attn.out_proj.weight", "copy")
            m[f"{fp}/{att}/out_proj_bias"] = (f"{tp}.{tatt}.attn.out_proj.bias", "copy")
        m.update(_ln(f"{fp}/attention_norm", f"{tp}.attention_norm"))
        m.update(_ln(f"{fp}/attention_norm_depth", f"{tp}.attention_norm_depth"))
        for ffn, tffn in (("ffn", "ffn"), ("ffn_depth", "ffn_depth")):
            m.update(_linear(f"{fp}/{ffn}/fc1", f"{tp}.{tffn}.layers.0.0"))
            m.update(_linear(f"{fp}/{ffn}/fc2", f"{tp}.{tffn}.layers.1"))
        m.update(_ln(f"{fp}/ffn_norm", f"{tp}.ffn_norm"))
        m.update(_ln(f"{fp}/ffn_norm_depth", f"{tp}.ffn_norm_depth"))
        # towers: torch interleaves [Linear, LN, ReLU] in one ModuleList
        for i in range(num_cls_fcs):
            m.update(_linear(f"{fp}/cls_fc{i}", f"{tp}.cls_fcs.{3 * i}", bias=False))
            m.update(_ln(f"{fp}/cls_ln{i}", f"{tp}.cls_fcs.{3 * i + 1}"))
        for i in range(num_mask_fcs):
            m.update(_linear(f"{fp}/mask_fc{i}", f"{tp}.mask_fcs.{3 * i}", bias=False))
            m.update(_ln(f"{fp}/mask_ln{i}", f"{tp}.mask_fcs.{3 * i + 1}"))
            # depth_regs interleave [Linear, LN] (no act)
            m.update(_linear(f"{fp}/depth_fc{i}", f"{tp}.depth_regs.{2 * i}", bias=False))
            m.update(_ln(f"{fp}/depth_ln{i}", f"{tp}.depth_regs.{2 * i + 1}"))
        m.update(_linear(f"{fp}/fc_cls", f"{tp}.fc_cls"))
        m.update(_linear(f"{fp}/fc_mask", f"{tp}.fc_mask"))
        m.update(_linear(f"{fp}/fc_depth", f"{tp}.fc_depth"))

    # ---- track head ---------------------------------------------------------
    if with_track:
        for i in range(4):
            m.update(_prefix(_convnormact(f"track_head.convs.{i}"),
                             f"track_head/embed_mlp/conv{i}"))
        # fc0 consumes the flattened 7x7 roi features: torch flattens
        # (C, 7, 7) C-major, our NHWC tower flattens (7, 7, C) — reorder the
        # input dimension (verified by tests/test_reference_video_parity.py)
        m["track_head/embed_mlp/fc0/kernel"] = (
            "track_head.fcs.0.weight", "linear_chw2hwc_7")
        m["track_head/embed_mlp/fc0/bias"] = ("track_head.fcs.0.bias", "copy")
        m.update(_linear("track_head/embed_mlp/fc_embed", "track_head.fc_embed"))

    return m


def _transform(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "copy":
        return arr
    if kind == "conv":
        return np.transpose(arr, (2, 3, 1, 0))
    if kind == "linear":
        return np.transpose(arr, (1, 0))
    if kind == "squeeze11":
        return arr[:, :, 0, 0]
    if kind.startswith("linear_chw2hwc_"):
        # (O, C*k*k) with C-major input order -> (k*k*C, O) HWC-major
        k = int(kind.rsplit("_", 1)[1])
        o, ckk = arr.shape
        c = ckk // (k * k)
        w = arr.reshape(o, c, k, k).transpose(0, 2, 3, 1).reshape(o, -1)
        return np.transpose(w, (1, 0))
    if kind.startswith("vec_chw2hwc_"):
        # 1-D (C*k*k,) C-major -> (k*k*C,) HWC-major (LN over merged patches)
        k = int(kind.rsplit("_", 1)[1])
        c = arr.shape[0] // (k * k)
        return arr.reshape(c, k, k).transpose(1, 2, 0).reshape(-1)
    raise ValueError(kind)


def _inverse_transform(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "copy":
        return arr
    if kind == "conv":
        return np.transpose(arr, (3, 2, 0, 1))
    if kind == "linear":
        return np.transpose(arr, (1, 0))
    if kind == "squeeze11":
        return arr[:, :, None, None]
    if kind.startswith("linear_chw2hwc_"):
        k = int(kind.rsplit("_", 1)[1])
        kkc, o = arr.shape
        c = kkc // (k * k)
        w = np.transpose(arr, (1, 0)).reshape(o, k, k, c)
        return w.transpose(0, 3, 1, 2).reshape(o, -1)
    if kind.startswith("vec_chw2hwc_"):
        k = int(kind.rsplit("_", 1)[1])
        c = arr.shape[0] // (k * k)
        return arr.reshape(k, k, c).transpose(2, 0, 1).reshape(-1)
    raise ValueError(kind)


def flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_tree(v, path))
        else:
            out[path] = v
    return out


def unflatten_tree(flat):
    tree: Dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def convert_state_dict(state_dict: Dict[str, np.ndarray], model_cfg) -> Dict:
    """torch state_dict (numpy values) -> {'params': ..., 'batch_stats': ...}"""
    mapping = build_param_mapping(model_cfg.num_stages, model_cfg.backbone,
                                  model_cfg.with_track)
    params_flat, stats_flat = {}, {}
    missing = []
    for flax_path, (torch_key, kind) in mapping.items():
        if torch_key not in state_dict:
            missing.append(torch_key)
            continue
        arr = _transform(np.asarray(state_dict[torch_key]), kind)
        if flax_path.startswith("BATCHSTATS::"):
            stats_flat[flax_path[len("BATCHSTATS::"):]] = arr
        else:
            params_flat[flax_path] = arr
    if missing:
        raise KeyError(f"{len(missing)} torch keys missing, e.g. {missing[:5]}")
    return {"params": unflatten_tree(params_flat),
            "batch_stats": unflatten_tree(stats_flat)}


def self_test(backbone: str = "resnet50") -> None:
    """Round-trip validation: flax init tree -> synthetic torch state_dict ->
    convert -> identical tree (up to dtype).  Structure comes from
    ``jax.eval_shape`` (no real init), values from the synthetic state dict."""
    import jax
    import jax.numpy as jnp

    from ..configs import ModelConfig
    from ..models import PolyphonicFormer

    cfg = ModelConfig(backbone=backbone, out_channels=64, in_channels=64,
                      fpn_out_channels=64, feedforward_channels=128,
                      num_proposals=10, with_track=True)
    model = PolyphonicFormer(cfg)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)),
                           method=PolyphonicFormer.init_all))
    mapping = build_param_mapping(cfg.num_stages, cfg.backbone, cfg.with_track)

    flat_params = flatten_tree(variables["params"])
    flat_stats = flatten_tree(variables.get("batch_stats", {}))
    all_flat = dict(flat_params)
    all_flat.update({f"BATCHSTATS::{k}": v for k, v in flat_stats.items()})

    map_paths = set(mapping.keys())
    tree_paths = set(all_flat.keys())
    only_map = sorted(map_paths - tree_paths)
    only_tree = sorted(tree_paths - map_paths)
    assert not only_map, f"mapping has unknown paths: {only_map[:10]}"
    assert not only_tree, f"unmapped flax params: {only_tree[:10]}"

    # synthetic torch state dict with correct torch-side shapes
    sd = {}
    rng = np.random.RandomState(0)
    for flax_path, (torch_key, kind) in mapping.items():
        sd[torch_key] = _inverse_transform(
            rng.randn(*all_flat[flax_path].shape).astype(np.float32), kind)

    converted = convert_state_dict(sd, cfg)
    conv_flat = flatten_tree(converted["params"])
    stat_flat = flatten_tree(converted["batch_stats"])
    for path, arr in flat_params.items():
        assert conv_flat[path].shape == arr.shape, path
        want = _transform(sd[mapping[path][0]], mapping[path][1])
        np.testing.assert_array_equal(conv_flat[path], want)
    for path, arr in flat_stats.items():
        assert stat_flat[path].shape == arr.shape, path
    print(f"self-test OK ({backbone}): "
          f"{len(mapping)} parameters mapped bijectively")


def load_torch_state_dict(path: str,
                          allow_unsafe: bool = False) -> Dict[str, np.ndarray]:
    """Read a real torch.save checkpoint file -> numpy state dict.

    The reference's published checkpoints wrap the weights as
    {'state_dict': ..., 'meta': {...}} (mmcv CheckpointHook).  Newer torch
    defaults to weights_only=True, which rejects non-tensor meta payloads.
    First try the safe path with the benign stdlib types mmcv's meta dict
    uses allowlisted; a full unpickle (arbitrary code execution on a
    tampered file — the published .pth files are third-party downloads) is
    only attempted when the caller explicitly passes --unsafe-load."""
    import torch

    try:
        # mmcv CheckpointHook meta holds stdlib scalars/containers plus
        # occasionally OrderedDict/datetime — all safe to allowlist.
        try:
            import collections
            import datetime
            torch.serialization.add_safe_globals(
                [collections.OrderedDict, datetime.datetime])
        except Exception:
            pass  # older torch without add_safe_globals
        raw = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_unsafe:
            raise RuntimeError(
                f"{path}: weights_only=True load failed and full unpickle "
                "is disabled (it runs arbitrary code from the file). "
                "Re-run with --unsafe-load if you trust this checkpoint.")
        raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="path to reference .pth checkpoint")
    ap.add_argument("--out", help="output .pkl for the converted variables")
    ap.add_argument("--video", action="store_true", help="video model (track head)")
    ap.add_argument("--backbone", default="resnet50",
                    help="resnet50 | swin_tiny | swin_large")
    ap.add_argument("--self-test", action="store_true")
    ap.add_argument("--unsafe-load", action="store_true",
                    help="permit full-unpickle torch.load fallback "
                         "(arbitrary code execution on a tampered file)")
    args = ap.parse_args()
    if args.self_test:
        self_test("resnet50")
        self_test("swin_tiny")
        return
    from ..configs import ModelConfig

    sd = load_torch_state_dict(args.ckpt, allow_unsafe=args.unsafe_load)
    cfg = ModelConfig(with_track=args.video, backbone=args.backbone)
    variables = convert_state_dict(sd, cfg)
    with open(args.out, "wb") as f:
        pickle.dump(variables, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
