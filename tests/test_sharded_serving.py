"""Multi-clip serving over a device mesh (BASELINE config #5): B independent
sequences batched into one SPMD program, batch/tracker state sharded over
'data', weights replicated — outputs identical to the unsharded step.

Composes with Swin tensor parallelism (tests/test_swin_sharding.py shards
the backbone over 'model'); here the serving pipeline itself is validated
under the mesh.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from polyphonicformer_tpu.configs import ModelConfig
from polyphonicformer_tpu.infer.pipeline import batched_video_step
from polyphonicformer_tpu.infer.tracker import init_tracker_state
from polyphonicformer_tpu.models import PolyphonicFormer
from polyphonicformer_tpu.parallel.mesh import make_mesh

H, W = 64, 128


def test_batched_serving_sharded_matches_unsharded():
    assert jax.device_count() >= 8
    cfg = ModelConfig(out_channels=64, in_channels=64, fpn_out_channels=64,
                      feedforward_channels=128, num_proposals=20,
                      max_per_img=20, with_track=True)
    model = PolyphonicFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                           method=PolyphonicFormer.init_all)

    b = 8  # one clip per device
    x = jax.random.normal(jax.random.PRNGKey(1), (b, H, W, 3), jnp.float32)
    states = jax.vmap(lambda _: init_tracker_state(
        cfg.tracker, cfg.track_head.embed_channels))(jnp.arange(b))
    fids = jnp.ones((b,), jnp.int32)

    def step(v, xs, st, f):
        return batched_video_step(model, cfg, v, xs, st, f, (H, W))

    fo_ref, st_ref = jax.jit(step)(variables, x, states, fids)

    mesh = make_mesh()  # (8, 1): serving shards clips over 'data'
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    v_g = jax.device_put(variables, repl)
    x_g = jax.device_put(x, data_sh)
    st_g = jax.tree_util.tree_map(lambda a: jax.device_put(a, data_sh), states)
    f_g = jax.device_put(fids, data_sh)
    fo_s, st_s = jax.jit(step)(v_g, x_g, st_g, f_g)

    np.testing.assert_array_equal(np.asarray(fo_ref.semantic),
                                  np.asarray(fo_s.semantic))
    np.testing.assert_array_equal(np.asarray(fo_ref.track_map),
                                  np.asarray(fo_s.track_map))
    np.testing.assert_allclose(np.asarray(fo_ref.depth),
                               np.asarray(fo_s.depth), rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st_ref.ids),
                                  np.asarray(st_s.ids))
    # the batch axis is genuinely partitioned across the 8 devices
    assert len(fo_s.semantic.sharding.device_set) == 8


def test_batched_serving_pallas_prune_path(monkeypatch):
    """The batched serving step with the PALLAS fusion + prune + deferred
    map rendering active (interpreted kernels on CPU) matches the per-image
    video_frame_step — regression for n_render becoming a batched tracer
    under vmap (the single-image path keeps it a static int)."""
    from polyphonicformer_tpu.infer.pipeline import video_frame_step

    monkeypatch.setenv("POLY_PALLAS_FUSION", "interpret")
    cfg = ModelConfig(out_channels=64, in_channels=64, fpn_out_channels=64,
                      feedforward_channels=128, num_proposals=20,
                      max_per_img=20, with_track=True,
                      fusion_full_things=5)  # prune active: 5 + 11 < 20
    model = PolyphonicFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                           method=PolyphonicFormer.init_all)
    b = 2
    x = jax.random.normal(jax.random.PRNGKey(2), (b, H, W, 3), jnp.float32)
    states = jax.vmap(lambda _: init_tracker_state(
        cfg.tracker, cfg.track_head.embed_channels))(jnp.arange(b))
    fids = jnp.ones((b,), jnp.int32)

    fo_b, st_b = jax.jit(lambda v, xs, st, f: batched_video_step(
        model, cfg, v, xs, st, f, (H, W), compute_dtype=jnp.bfloat16,
        fusion_dtype=jnp.bfloat16))(variables, x, states, fids)

    # bf16 conv accumulation differs between batch sizes, so random-init
    # argmax ties flip a few pixels between the two programs; assert gross
    # agreement (the regression guarded here was a trace-time crash and
    # wrong n_render truncation, both of which corrupt most of the map)
    for i in range(b):
        st1 = jax.tree_util.tree_map(lambda a: a[i], states)
        fo1, _ = jax.jit(lambda v, xs, st, f: video_frame_step(
            model, cfg, v, xs, st, f, (H, W), compute_dtype=jnp.bfloat16,
            fusion_dtype=jnp.bfloat16))(variables, x[i:i + 1], st1, fids[i])
        sem_match = (np.asarray(fo_b.semantic[i])
                     == np.asarray(fo1.semantic)).mean()
        trk_match = (np.asarray(fo_b.track_map[i])
                     == np.asarray(fo1.track_map)).mean()
        assert sem_match > 0.9, sem_match
        assert trk_match > 0.9, trk_match
        assert np.isfinite(np.asarray(fo_b.depth[i])).all()
