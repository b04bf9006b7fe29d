"""map_render kernel parity (interpret mode) vs the XLA gather formulation
it replaces (infer/panoptic.py else-branch + track gather)."""
import numpy as np

import jax.numpy as jnp

from polyphonicformer_tpu.ops.pallas.map_render import render_maps


def test_render_matches_gathers():
    rng = np.random.RandomState(0)
    kk, h, w = 111, 32, 128
    num_classes = 19
    pix = jnp.asarray(rng.randint(0, kk, (h, w)), jnp.int32)
    dep = jnp.asarray(rng.rand(h, w) * 70, jnp.float32)
    db = jnp.asarray(rng.rand(h, w) * 70, jnp.float32)
    labels = jnp.asarray(rng.randint(0, num_classes, (kk,)), jnp.int32)
    seg = jnp.asarray(rng.randint(0, kk + 1, (kk,)), jnp.int32)
    keep = jnp.asarray(rng.rand(kk) > 0.4)
    track = jnp.asarray(rng.randint(0, 1 << 20, (kk,)), jnp.int32)
    track = track * keep.astype(jnp.int32)

    sem, pan, depth, trk = render_maps(pix, dep, db, labels, seg, keep,
                                       track, num_classes, interpret=True)

    kap = np.asarray(keep)[np.asarray(pix)]
    want_sem = np.where(kap, np.asarray(labels)[np.asarray(pix)], num_classes)
    want_pan = np.where(kap, np.asarray(seg)[np.asarray(pix)], 0)
    want_depth = np.where(kap, np.asarray(dep), np.asarray(db))
    want_trk = np.asarray(track)[np.asarray(pix)]

    np.testing.assert_array_equal(np.asarray(sem), want_sem)
    np.testing.assert_array_equal(np.asarray(pan), want_pan)
    np.testing.assert_allclose(np.asarray(depth), want_depth, rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(trk), want_trk)
