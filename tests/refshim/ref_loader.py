"""Load the REAL reference PolyphonicFormer model code from /root/reference
on CPU torch, using the pure-torch mmcv shim in this directory.

Strategy: the reference's `mmdet` package has heavy __init__ chains (all 40+
detectors, pycocotools-based evaluation, matplotlib visualization).  Instead
of executing those, this loader pre-installs package SKELETONS — module
objects whose ``__path__`` points at the real source directories but whose
init bodies are empty — then imports exactly the leaf modules the Polyphonic
model graph needs.  Every loaded model/module file is the genuine reference
source; only plumbing symbols provided by external libraries (mmcv, and the
single ``reduce_mean`` re-export in mmdet's atss_head) are shimmed.

Used by tests/test_reference_parity.py; never shipped."""
from __future__ import annotations

import os
import sys
import types

REFSHIM_DIR = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"

_PACKAGES = [
    "mmdet",
    "mmdet.utils",
    "mmdet.core",
    "mmdet.core.utils",
    "mmdet.core.mask",
    "mmdet.core.bbox",
    "mmdet.core.bbox.assigners",
    "mmdet.core.bbox.samplers",
    "mmdet.core.bbox.match_costs",
    "mmdet.core.bbox.iou_calculators",
    "mmdet.core.visualization",
    "mmdet.models",
    "mmdet.models.detectors",
    "mmdet.models.backbones",
    "mmdet.models.necks",
    "mmdet.models.losses",
    "mmdet.models.utils",
    "mmdet.models.dense_heads",
    "mmdet.models.roi_heads",
    "mmdet.models.roi_heads.roi_extractors",
    "polyphonic",
    "polyphonic.funcs",
    "polyphonic.losses",
    "polyphonic.video",
    "polyphonic.video.qdtrack",
    "polyphonic.video.qdtrack.losses",
    "polyphonic.video.qdtrack.trackers",
]


def _skeleton(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = [os.path.join(REF, *name.split("."))]
    mod.__package__ = name
    sys.modules[name] = mod
    if "." in name:
        parent, leaf = name.rsplit(".", 1)
        setattr(sys.modules[parent], leaf, mod)
    return mod


def install() -> types.ModuleType:
    """Install shim + skeletons and import the reference model modules.
    Returns the `polyphonic` package (idempotent)."""
    if "polyphonic" in sys.modules and hasattr(sys.modules["polyphonic"],
                                               "Polyphonic"):
        return sys.modules["polyphonic"]

    if REFSHIM_DIR not in sys.path:
        sys.path.insert(0, REFSHIM_DIR)
    import mmcv  # noqa: F401  — resolves to the shim in this directory
    assert "refshim" in (mmcv.__file__ or ""), (
        "refshim must shadow any installed mmcv")

    for name in _PACKAGES:
        if name not in sys.modules:
            _skeleton(name)

    # ---- stubbed plumbing (documented deviations from real source) ------
    # real atss_head.py drags in the whole anchor-head stack; the reference
    # only imports its `reduce_mean` re-export (kernel_update_head.py:10)
    atss = types.ModuleType("mmdet.models.dense_heads.atss_head")
    sys.modules["mmdet.models.dense_heads.atss_head"] = atss
    # visualization: matplotlib/pycocotools churn, only reachable from
    # BaseDetector.show_result which the tests never call
    vis = sys.modules["mmdet.core.visualization"]

    def _no_vis(*a, **k):
        raise NotImplementedError("refshim: visualization stubbed")

    vis.imshow_det_bboxes = _no_vis
    vis.imshow_gt_det_bboxes = _no_vis

    import importlib

    # ---- real mmdet leaf modules (dependency order) ----------------------
    m_logger = importlib.import_module("mmdet.utils.logger")
    importlib.import_module("mmdet.utils.util_mixins")
    mu = sys.modules["mmdet.utils"]
    mu.get_root_logger = m_logger.get_root_logger

    bbox_builder = importlib.import_module("mmdet.core.bbox.builder")
    assign_result = importlib.import_module(
        "mmdet.core.bbox.assigners.assign_result")
    base_assigner = importlib.import_module(
        "mmdet.core.bbox.assigners.base_assigner")
    sampling_result = importlib.import_module(
        "mmdet.core.bbox.samplers.sampling_result")
    base_sampler = importlib.import_module(
        "mmdet.core.bbox.samplers.base_sampler")
    transforms = importlib.import_module("mmdet.core.bbox.transforms")
    iou_calc = importlib.import_module(
        "mmdet.core.bbox.iou_calculators.iou2d_calculator")
    importlib.import_module("mmdet.core.bbox.match_costs.builder")
    iou_pkg = sys.modules["mmdet.core.bbox.iou_calculators"]
    iou_pkg.bbox_overlaps = importlib.import_module(
        "mmdet.core.bbox.iou_calculators.iou2d_calculator").bbox_overlaps
    importlib.import_module("mmdet.core.bbox.match_costs.match_cost")
    importlib.import_module("mmdet.core.mask.structures")
    misc = importlib.import_module("mmdet.core.utils.misc")
    dist_utils = importlib.import_module("mmdet.core.utils.dist_utils")

    core = sys.modules["mmdet.core"]
    core_bbox = sys.modules["mmdet.core.bbox"]
    for target in (core, core_bbox):
        target.build_assigner = bbox_builder.build_assigner
        target.build_sampler = bbox_builder.build_sampler
        target.AssignResult = assign_result.AssignResult
        target.BaseAssigner = base_assigner.BaseAssigner
        target.BaseSampler = base_sampler.BaseSampler
        target.SamplingResult = sampling_result.SamplingResult
        target.bbox2roi = transforms.bbox2roi
        target.bbox_overlaps = iou_calc.bbox_overlaps
    core.multi_apply = misc.multi_apply
    core.reduce_mean = dist_utils.reduce_mean
    core.mask = sys.modules["mmdet.core.mask"]

    builder = importlib.import_module("mmdet.models.builder")
    atss.reduce_mean = dist_utils.reduce_mean

    loss_utils = importlib.import_module("mmdet.models.losses.utils")
    acc_mod = importlib.import_module("mmdet.models.losses.accuracy")
    importlib.import_module("mmdet.models.losses.focal_loss")
    importlib.import_module("mmdet.models.losses.cross_entropy_loss")
    importlib.import_module("mmdet.models.losses.dice_loss")
    losses_pkg = sys.modules["mmdet.models.losses"]
    losses_pkg.accuracy = acc_mod.accuracy  # function, not the module
    losses_pkg.utils = loss_utils

    res_layer = importlib.import_module("mmdet.models.utils.res_layer")
    importlib.import_module("mmdet.models.utils.positional_encoding")
    mdl_utils = sys.modules["mmdet.models.utils"]
    mdl_utils.ResLayer = res_layer.ResLayer

    base_det = importlib.import_module("mmdet.models.detectors.base")
    two_stage = importlib.import_module("mmdet.models.detectors.two_stage")
    det_pkg = sys.modules["mmdet.models.detectors"]
    det_pkg.BaseDetector = base_det.BaseDetector
    det_pkg.TwoStageDetector = two_stage.TwoStageDetector

    importlib.import_module("mmdet.models.backbones.resnet")
    importlib.import_module("mmdet.models.necks.fpn")

    base_roi_head = importlib.import_module(
        "mmdet.models.roi_heads.base_roi_head")
    roi_heads_pkg = sys.modules["mmdet.models.roi_heads"]
    roi_heads_pkg.BaseRoIHead = base_roi_head.BaseRoIHead
    importlib.import_module(
        "mmdet.models.roi_heads.roi_extractors.base_roi_extractor")
    importlib.import_module(
        "mmdet.models.roi_heads.roi_extractors.single_level_roi_extractor")

    models_pkg = sys.modules["mmdet.models"]
    for sym in ("DETECTORS", "HEADS", "NECKS", "BACKBONES", "LOSSES",
                "ROI_EXTRACTORS", "build_detector", "build_head",
                "build_loss", "build_neck", "build_backbone",
                "build_roi_extractor"):
        setattr(models_pkg, sym, getattr(builder, sym))
    models_pkg.weight_reduce_loss = loss_utils.weight_reduce_loss
    models_pkg.weighted_loss = loss_utils.weighted_loss

    # ---- real polyphonic project modules ---------------------------------
    importlib.import_module("polyphonic.funcs.depth_utils")
    importlib.import_module("polyphonic.funcs.utils")
    importlib.import_module("polyphonic.funcs.kernel_updator")
    importlib.import_module("polyphonic.funcs.assigner")
    importlib.import_module("polyphonic.funcs.sampler")
    importlib.import_module("polyphonic.funcs.semantic_fpn")
    importlib.import_module("polyphonic.losses.depth_loss")
    importlib.import_module("polyphonic.kernel_head")
    importlib.import_module("polyphonic.kernel_update_head")
    importlib.import_module("polyphonic.kernel_update")
    former = importlib.import_module("polyphonic.polyphonic_former")

    # video side
    importlib.import_module("polyphonic.video.utils")
    importlib.import_module("polyphonic.video.qdtrack.builder")
    importlib.import_module("polyphonic.video.qdtrack.track")
    importlib.import_module(
        "polyphonic.video.qdtrack.losses.multipos_cross_entropy_loss")
    importlib.import_module("polyphonic.video.qdtrack.losses.l2_loss")
    importlib.import_module(
        "polyphonic.video.qdtrack.trackers.quasi_dense_embed_tracker")
    importlib.import_module("polyphonic.video.track_heads")
    former_video = importlib.import_module("polyphonic.polyphonic_former_video")

    poly = sys.modules["polyphonic"]
    poly.Polyphonic = former.Polyphonic
    poly.PolyphonicVideo = former_video.PolyphonicVideo
    poly.builder = builder
    return poly


def load_swin():
    """Import the REAL mmdet SwinTransformer
    (/root/reference/mmdet/models/backbones/swin.py) through the shim and
    return that module.  Separate from install(): the polyphonic graph
    itself never uses Swin (the reference ships R50 configs only), but the
    converter's Swin mapping is parity-tested against this code."""
    install()
    import importlib

    importlib.import_module("mmdet.models.utils.ckpt_convert")
    importlib.import_module("mmdet.models.utils.transformer")
    return importlib.import_module("mmdet.models.backbones.swin")


def load_video_evaluate():
    """Import the REAL reference DVPQ aggregation
    (/root/reference/polyphonic/apis/video_evaluate.py) through the shim
    and return that module.  Installs skeletons for the two packages the
    eval path needs beyond install(): ``datasets`` (for datasets.utils's
    vpq_eval oracle) and ``polyphonic.apis`` (so only the eval leaf module
    executes, not video_inference's mmdet.apis chain).  The 128-process
    pool resolves to the shim's serial pool
    (refshim/mmcv/utils/progressbar.py) — same call graph and result
    ordering, no subprocesses."""
    import importlib

    if REFSHIM_DIR not in sys.path:
        sys.path.insert(0, REFSHIM_DIR)
    import mmcv  # noqa: F401

    assert "refshim" in (mmcv.__file__ or "")
    for name in ("polyphonic", "polyphonic.apis", "datasets"):
        if name not in sys.modules:
            _skeleton(name)
    importlib.import_module("datasets.utils")
    return importlib.import_module("polyphonic.apis.video_evaluate")
