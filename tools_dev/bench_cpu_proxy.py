"""Measured baseline denominator: reference torch CPU vs this framework's
JAX CPU, same host, same input size, both effectively single-threaded
(1-core testbed).

BASELINE.md's 2.5 fps reference-GPU figure is an estimate (the reference
repo publishes no throughput numbers).  This controlled same-host ratio
anchors it with a measurement: the REAL reference network source (loaded via
tests/refshim, random init, eval mode, full ``simple_test`` serving path
incl. panoptic merge) vs our image serving step (``make_image_step``), both
on CPU at the same resolution.  The ratio is hardware-independent evidence
of the software-stack speedup, reported alongside (not replacing) the
estimate.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools_dev/bench_cpu_proxy.py
       [--hw 512,1024] [--iters 3]
Writes tools_dev/cpu_proxy.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def bench_reference(h, w, iters):
    import torch

    torch.set_num_threads(1)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests", "refshim"))
    import ref_loader
    from test_reference_parity import _as_cfg, _reference_model_cfg

    poly = ref_loader.install()
    torch.manual_seed(0)
    cfg = _as_cfg(_reference_model_cfg())
    model = poly.Polyphonic(
        backbone=cfg["backbone"], neck=cfg["neck"], rpn_head=cfg["rpn_head"],
        roi_head=cfg["roi_head"], train_cfg=None, test_cfg=cfg["test_cfg"],
        num_thing_classes=cfg["num_thing_classes"],
        num_stuff_classes=cfg["num_stuff_classes"])
    model.eval()
    img = torch.from_numpy(
        np.random.RandomState(0).randn(1, 3, h, w).astype(np.float32))
    img_metas = [dict(img_shape=(h, w, 3), batch_input_shape=(h, w),
                      ori_shape=(h, w, 3), scale_factor=1.0, flip=False)]
    times = []
    with torch.no_grad():
        model.simple_test(img, img_metas)  # warmup
        for _ in range(iters):
            t0 = time.perf_counter()
            model.simple_test(img, img_metas)
            times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_ours(h, w, iters):
    import jax
    import jax.numpy as jnp

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.infer.pipeline import make_image_step
    from polyphonicformer_tpu.models import PolyphonicFormer

    cfg = ModelConfig()
    model = PolyphonicFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 128, 3), jnp.float32))
    step = jax.jit(make_image_step(model, cfg, (h, w)))
    img = jnp.asarray(
        np.random.RandomState(0).randn(1, h, w, 3).astype(np.float32))
    out = step(variables, img)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = step(variables, img)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="512,1024")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))

    t_ours = bench_ours(h, w, args.iters)
    print(f"ours (JAX CPU, {h}x{w}): {t_ours * 1000:.1f} ms/frame")
    t_ref = bench_reference(h, w, args.iters)
    print(f"reference (torch CPU, {h}x{w}): {t_ref * 1000:.1f} ms/frame")
    ratio = t_ref / t_ours
    print(f"same-host CPU speedup ratio: {ratio:.2f}x")
    out = dict(h=h, w=w, iters=args.iters, torch_cpu_s=t_ref,
               jax_cpu_s=t_ours, ratio=ratio,
               note="single-thread same-host proxy; see BASELINE.md")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "cpu_proxy.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
