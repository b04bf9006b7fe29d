"""AOT serving export (tools/export.py): jax.export roundtrip.

The exported artifact must (a) deserialize and run without touching the
model-building code path, (b) reproduce the live jitted pipeline's outputs
exactly (same program, same backend), for both the stateless image mode and
the stateful streaming frame mode.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.configs import ModelConfig
from polyphonicformer_tpu.infer.pipeline import make_image_step, make_video_step
from polyphonicformer_tpu.infer.tracker import init_tracker_state
from polyphonicformer_tpu.models import PolyphonicFormer
from polyphonicformer_tpu.tools.export import export_serving, load_serving

H, W = 64, 128


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(out_channels=32, in_channels=32, fpn_out_channels=32,
                      feedforward_channels=64, num_proposals=12,
                      max_per_img=12, with_track=True)
    model = PolyphonicFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                           method=PolyphonicFormer.init_all)
    return cfg, model, variables


def test_export_image_roundtrip(tiny, tmp_path):
    cfg, model, variables = tiny
    blob = export_serving(model, cfg, variables, "image", (H, W))
    path = tmp_path / "image.jaxexp"
    path.write_bytes(blob)

    img = jnp.asarray(np.random.RandomState(0).randn(1, H, W, 3), jnp.float32)
    live = make_image_step(model, cfg, (H, W))(variables, img)
    fn = load_serving(str(path))
    loaded = fn(variables, img)

    live_l = jax.tree_util.tree_leaves(live)
    loaded_l = jax.tree_util.tree_leaves(loaded)
    assert len(live_l) == len(loaded_l)
    for a, b in zip(live_l, loaded_l):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_frame_stateful_roundtrip(tiny, tmp_path):
    cfg, model, variables = tiny
    blob = export_serving(model, cfg, variables, "frame", (H, W))
    fn = load_serving(blob)  # bytes accepted directly

    live_step = make_video_step(model, cfg, (H, W))
    s_live = init_tracker_state(cfg.tracker, cfg.track_head.embed_channels)
    s_art = s_live
    rng = np.random.RandomState(1)
    for t in range(2):  # state must thread identically across frames
        img = jnp.asarray(rng.randn(1, H, W, 3), jnp.float32)
        out_live, s_live = live_step(variables, img, s_live, jnp.int32(t + 1))
        out_art, s_art = fn(variables, img, s_art, jnp.int32(t + 1))
        for a, b in zip(jax.tree_util.tree_leaves((out_live, s_live)),
                        jax.tree_util.tree_leaves((out_art, s_art))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_cli(tiny, tmp_path, monkeypatch):
    # the CLI path with a tiny preset-free config would build the full R50;
    # drive main() with a monkeypatched ModelConfig to keep it CPU-fast
    from polyphonicformer_tpu.tools import export as ex

    cfg, model, variables = tiny
    monkeypatch.setattr(ex, "export_serving",
                        lambda *a, **k: b"artifact-bytes")
    out = tmp_path / "a.jaxexp"
    ex.main(["--mode", "image", "--hw", "64", "128", "--out", str(out)])
    assert out.read_bytes() == b"artifact-bytes"
