"""Dev-only: donated full step under track-path variants (boxes source x
roi impl), plus the no-track step as the floor."""
from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def timed_step(step, state, batch, reps=5):
    s, m = step(state, batch)
    _ = float(m["total_loss"])
    times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        s2, m = step(s, batch)
        _ = float(m["total_loss"])
        times.append(time.perf_counter() - t0)
        s = s2
    return sorted(times)[len(times) // 2]


def main():
    from polyphonicformer_tpu.configs import (ExperimentConfig, ModelConfig,
                                              TrackHeadConfig)
    from polyphonicformer_tpu.data.loader import synthetic_batch
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.train.step import create_train_state, make_train_step

    h, w = 1024, 2048

    def run(boxes, roi_impl):
        os.environ["POLY_TRACK_BOXES"] = boxes
        mc = ModelConfig(with_track=True, compute_dtype="bfloat16",
                         track_head=TrackHeadConfig(roi_impl=roi_impl))
        cfg = ExperimentConfig(model=mc)
        model = PolyphonicFormer(mc)
        state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                       (1, h, w, 3))
        batch = synthetic_batch(mc, 1, hw=(h, w), two_frame=True)
        batch = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if a is not None else None, batch)
        step = make_train_step(model, mc, tx, video=True, donate=False)
        t = timed_step(step, state, batch)
        print(f"boxes={boxes:9s} roi={roi_impl:10s} {t*1000:8.1f} ms",
              flush=True)

    for boxes, roi in [("marginal", "separable"), ("masks", "separable"),
                       ("masks", "gather"), ("marginal", "gather")]:
        run(boxes, roi)
    os.environ["POLY_TRACK_BOXES"] = "marginal"


if __name__ == "__main__":
    main()
