"""Dev-only round 3: stem as K-major plane-stack einsum.

out(p,q,n) = sum_{a,b,c} w[a,b,c,n] x[2p+a-3, 2q+b-3, c]
with x phase-split into 12 zero-padded planes (2 row-parities x 2 col-
parities x 3 channels) of (512, 1024); each of the 147 taps is a whole-tile
row/col shift of one plane (sublane shifts + lane shifts by <=2 — no
stride-2 lane gathers anywhere).  The 147-term contraction runs as ONE
einsum with K on the leading axis.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

T = 8
DT = jnp.bfloat16
H, W = 1024, 2048
HO, WO = H // 2, W // 2


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(fn, *args, reps=3, inner=2):
    _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / inner)
    return sorted(times)[len(times) // 2]


def scanbench(name, body, x, noop_ms, check=None):
    @jax.jit
    def fn(xs):
        def b(c, im):
            return c, (body(im).astype(jnp.float32).sum(),)

        return jax.lax.scan(b, 0, xs)[1]

    t = timed(fn, x) / T * 1000
    extra = ""
    if check is not None:
        got = np.asarray(jax.jit(body)(x[0]), np.float32)
        err = np.abs(got.reshape(-1) - check.reshape(-1)).max() / max(
            np.abs(check).max(), 1e-6)
        extra = f"  relerr {err:.2e}"
    print(f"{name:44s} {t - noop_ms:8.2f} ms{extra}")


def stem_plane_stack(im, w):
    """im: (H, W, 3); w: (7, 7, 3, 64) -> (HO, WO, 64)."""
    # 12 phase planes, zero-padded by 2 on each side: (2, 2, 3, HO+4, WO+4)
    x4 = im.reshape(HO, 2, WO, 2, 3).transpose(1, 3, 4, 0, 2)
    xp = jnp.pad(x4, ((0, 0), (0, 0), (0, 0), (2, 2), (2, 2)))
    terms = []
    wrows = []
    for a in range(7):
        py = (a - 3) % 2
        u = (a - 3 - py) // 2  # in {-2, -1, 0, 1}
        for b in range(7):
            px = (b - 3) % 2
            v = (b - 3 - px) // 2
            # plane shifted by (u, v): out(p,q) needs plane[p+u, q+v]
            sl = xp[py, px, :, 2 + u: 2 + u + HO, 2 + v: 2 + v + WO]
            terms.append(sl)  # (3, HO, WO)
            wrows.append(w[a, b])  # (3, 64)
    stack = jnp.concatenate(terms, axis=0)  # (147, HO, WO)
    wmat = jnp.concatenate(wrows, axis=0).astype(im.dtype)  # (147, 64)
    return jnp.einsum("khw,kn->hwn", stack, wmat)


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (T, H, W, 3), DT)

    @jax.jit
    def noop(xs):
        def b(c, im):
            return c, (im.astype(jnp.float32).sum(),)

        return jax.lax.scan(b, 0, xs)[1]

    noop_ms = timed(noop, x) / T * 1000
    print(f"{'noop':44s} {noop_ms:8.2f} ms")

    w = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, 64), DT) * 0.05

    def conv_a(im):
        return jax.lax.conv_general_dilated(
            im[None], w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    ref = np.asarray(jax.jit(conv_a)(x[0]), np.float32)
    scanbench("A: XLA conv (baseline)", conv_a, x, noop_ms)
    scanbench("H: 12-plane stack + K-major einsum",
              lambda im: stem_plane_stack(im, w), x, noop_ms, check=ref)

    # H2: NCHW-out variant (contraction unchanged, out channel-major)
    def stem_h2(im):
        x4 = im.reshape(HO, 2, WO, 2, 3).transpose(1, 3, 4, 0, 2)
        xp = jnp.pad(x4, ((0, 0), (0, 0), (0, 0), (2, 2), (2, 2)))
        terms, wrows = [], []
        for a in range(7):
            py = (a - 3) % 2
            u = (a - 3 - py) // 2
            for b in range(7):
                px = (b - 3) % 2
                v = (b - 3 - px) // 2
                terms.append(xp[py, px, :, 2 + u: 2 + u + HO,
                                2 + v: 2 + v + WO])
                wrows.append(w[a, b])
        stack = jnp.concatenate(terms, axis=0)
        wmat = jnp.concatenate(wrows, axis=0).astype(im.dtype)
        return jnp.einsum("khw,kn->nhw", stack, wmat)

    scanbench("H2: same, NCHW out",
              stem_h2, x, noop_ms, check=np.moveaxis(ref, -1, 0))

    # I: in-graph channel pad to 8 + XLA conv
    w8 = jnp.pad(w, ((0, 0), (0, 0), (0, 5), (0, 0)))

    def conv_i(im):
        im8 = jnp.pad(im, ((0, 0), (0, 0), (0, 5)))
        return jax.lax.conv_general_dilated(
            im8[None], w8, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    scanbench("I: C-pad 8 in-graph + XLA conv", conv_i, x, noop_ms, check=ref)

    # J: C-pad 4
    w4 = jnp.pad(w, ((0, 0), (0, 0), (0, 1), (0, 0)))

    def conv_j(im):
        im4 = jnp.pad(im, ((0, 0), (0, 0), (0, 1)))
        return jax.lax.conv_general_dilated(
            im4[None], w4, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    scanbench("J: C-pad 4 in-graph + XLA conv", conv_j, x, noop_ms, check=ref)


if __name__ == "__main__":
    main()
