"""Swin Transformer backbone (tiny -> large), TPU-native flax.

Provides the scaled backbone for the Swin-L serving configuration
(BASELINE.json config #5).  Standard Swin v1: 4x4 patch embed, 7x7 window
attention with relative position bias, alternating shifted windows, patch
merging between stages; returns 4 feature levels (strides 4/8/16/32).

Window partitioning uses static reshapes (inputs are padded to window
multiples), and the shifted-window attention mask is precomputed per stage —
no dynamic shapes anywhere, so the whole backbone is one XLA program.

Tensor parallelism (Swin-L multi-chip serving): with ``partition=True`` every
Dense kernel/bias carries flax logical-axis metadata
(``nn.with_logical_partitioning``) in the Megatron layout — qkv/MLP-fc1
column-sharded over 'model', attention-proj/MLP-fc2 row-sharded — and
``SWIN_LOGICAL_RULES`` maps those logical names onto the ('data', 'model')
mesh of parallel/mesh.py.  XLA's SPMD partitioner then inserts the
all-reduces the reference never needed (it serves Swin on one GPU).
Extract concrete shardings with ``parallel.mesh.logical_param_shardings``.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_XAVIER = nn.initializers.xavier_uniform()
_ZEROS = nn.initializers.zeros

# logical axis -> mesh axis. 'embed' (the residual stream) stays replicated;
# head and MLP-hidden dims shard over 'model'.
SWIN_LOGICAL_RULES = (
    ("swin_embed", None),
    ("swin_heads", "model"),
    ("swin_mlp", "model"),
    ("swin_merge", None),
    # the bias table is tiny and its head count can be odd (swin-tiny stage0
    # has 3 heads) -> keep it replicated; XLA reshards the gathered bias
    ("swin_rpb", None),
    ("swin_rpb_heads", None),
)


def _dense(features: int, name: str, axes: Tuple[str | None, str | None],
           partition: bool, use_bias: bool = True) -> nn.Dense:
    """nn.Dense whose kernel (and bias, when its dim is sharded) carries
    logical partitioning metadata when ``partition`` is on."""
    if not partition:
        return nn.Dense(features, name=name, use_bias=use_bias,
                        kernel_init=_XAVIER)
    return nn.Dense(
        features, name=name, use_bias=use_bias,
        kernel_init=nn.with_logical_partitioning(_XAVIER, axes),
        bias_init=nn.with_logical_partitioning(_ZEROS, (axes[1],)))


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B * nH * nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_unpartition(x: jax.Array, ws: int, hw: Tuple[int, int]) -> jax.Array:
    h, w = hw
    b = x.shape[0] // ((h // ws) * (w // ws))
    c = x.shape[-1]
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(num_windows, ws*ws, ws*ws) additive mask for shifted windows."""
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    m = img_mask.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    m = m.reshape(-1, ws * ws)
    attn = (m[:, :, None] != m[:, None, :]) * -100.0
    return attn.astype(np.float32)


def _use_fused_window_attn() -> bool:
    """Opt-in fused Pallas window attention (POLY_FUSED_WATTN=1 on TPU;
    =interpret forces the interpreted kernel for CPU tests).  Default OFF:
    measured SLOWER than the XLA path on v5e (stage-0 Swin-L 30.3 vs
    27.8 ms — XLA's bulk partition relayouts beat the kernel's in-VMEM
    transposes + 49x32 MXU tiles; tools_dev/bench_swin_parts.py).  Kept as
    a tested experimental op; revisit if Mosaic gains bf16 sublane casts
    (the f32 regroup is half the kernel's deficit)."""
    import os

    v = os.environ.get("POLY_FUSED_WATTN", "0")
    if v == "interpret":
        return True
    if v != "1":
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _fused_interpret() -> bool:
    import os

    return os.environ.get("POLY_FUSED_WATTN") == "interpret"


def _use_wattn_pair(nw: int, l: int) -> bool:
    """Gate for lane-packed paired-window attention (POLY_WATTN_PAIR).

    Packs TWO windows into one attention sequence (L=49 -> 98) with a
    block-diagonal bias/mask, halving the count of MXU-hostile 49x49
    batched matmuls and raising minor-dim lane utilization of the score
    tensor from 49/128 to 98/128.  Numerically identical to unpaired
    windows: cross-window logits sit at -100 (the same additive-mask
    convention the reference's shifted windows use,
    /root/reference/mmdet/models/backbones/swin.py W-MSA mask), so softmax
    zeroes them to ~1e-43.

    POLY_WATTN_PAIR = 1 (force on) | default off.  Measured NEUTRAL-to-
    -2% integrated on v5e (Swin-L serving 83.1 ms/frame paired vs 81.3
    unpaired, 1024x2048 bf16, round 5): the halved matmul count is offset
    by the doubled per-pair attention FLOPs and f32 score traffic (each
    pair computes 4 l-x-l blocks, 2 of them masked).  Kept opt-in with
    parity + grad tests, like the two Pallas attention experiments.
    """
    import os

    if 2 * l > 128:
        return False
    return os.environ.get("POLY_WATTN_PAIR") == "1"


def _use_wattn_math(num_heads: int, nw: int, partition: bool) -> bool:
    """Gate for the attention-math Pallas kernel (ops/pallas/win_attn_math).

    POLY_WATTN_MATH = xla (default) | interpret | auto | "6,12" (explicit
    per-stage head counts).  Defaults OFF: the kernel beats the isolated
    XLA attention chain at stages 0-2 (tools_dev/bench_wattn_math.py) but
    the INTEGRATED Swin-L serving step measures slower at every
    granularity swept (xla 81.7 / auto[stages 0-2] 90.7 / stage-0-only
    95.1 ms/frame, tools_dev/bench_swinl.py) — XLA overlaps the attention
    HBM round-trips with neighboring work that the pallas_call boundary
    serializes, the same integrated-vs-isolated inversion as the mask-loss
    megakernel (ROUND4.md)."""
    import os

    v = os.environ.get("POLY_WATTN_MATH", "xla")
    if v == "xla" or partition:
        return False
    if v == "interpret":
        return True
    if v not in ("auto", "1"):
        try:
            heads = {int(t) for t in v.split(",") if t.strip()}
        except ValueError:
            return False
        if num_heads not in heads:
            return False
    elif num_heads > 24 or nw < 128:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    partition: bool = False

    def _rpb_bias(self, l: int):
        rpb_init = nn.initializers.truncated_normal(0.02)
        if self.partition:
            rpb_init = nn.with_logical_partitioning(
                rpb_init, ("swin_rpb", "swin_rpb_heads"))
        rpb_table = self.param(
            "relative_position_bias_table", rpb_init,
            ((2 * self.window_size - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_relative_position_index(self.window_size))
        return rpb_table[idx.reshape(-1)].reshape(
            l, l, self.num_heads).transpose(2, 0, 1)

    def _paired_attention(self, qkv, bias, mask, c, h, hd, l, dtype):
        """Lane-packed attention over window PAIRS (see _use_wattn_pair).

        Two consecutive windows form one L=2l sequence; off-diagonal
        (cross-window) logits carry the -100 additive mask so softmax
        removes them, making the result numerically identical to the
        unpaired path.  Odd window counts pad one zero window (sliced off
        after).  Pairing across unrelated windows is always sound — the
        block mask, not locality, enforces the window structure.
        """
        nw = qkv.shape[0]
        pad = nw % 2
        if pad:
            qkv = jnp.concatenate(
                [qkv, jnp.zeros((1, l, 3 * c), qkv.dtype)], axis=0)
        npair = (nw + pad) // 2
        l2 = 2 * l
        neg = jnp.full((l, l), -100.0, jnp.float32)

        def block_diag(a, b):
            # (..., l, l) x2 -> (..., 2l, 2l) with -100 off-diagonal
            nb = jnp.broadcast_to(neg, a.shape)
            top = jnp.concatenate([a, nb], axis=-1)
            bot = jnp.concatenate([nb, b], axis=-1)
            return jnp.concatenate([top, bot], axis=-2)

        bias_p = block_diag(bias.astype(jnp.float32),
                            bias.astype(jnp.float32))  # (h, 2l, 2l)
        qkv_p = qkv.reshape(npair, l2, 3 * c)
        q = qkv_p[..., :c].reshape(npair, l2, h, hd)
        k = qkv_p[..., c:2 * c].reshape(npair, l2, h, hd)
        v = qkv_p[..., 2 * c:].reshape(npair, l2, h, hd)
        attn = jnp.einsum("wqhd,wkhd->whqk", q, k).astype(jnp.float32) \
            / np.sqrt(hd)
        attn = attn + bias_p[None]
        if mask is not None:
            # window w carries mask[w % ntypes] (the unpaired path's
            # reshape(nw//ntypes, ntypes, ...) indexing); tile then pair
            ntypes = mask.shape[0]
            reps = -(-(nw + pad) // ntypes)
            mfull = jnp.tile(mask.astype(jnp.float32),
                             (reps, 1, 1))[: nw + pad]
            mask_p = block_diag(mfull[0::2], mfull[1::2])  # (npair, 2l, 2l)
            attn = attn + mask_p[:, None]
        attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
        out = jnp.einsum("whqk,wkhd->wqhd", attn, v).reshape(
            nw + pad, l, c)
        return out[:nw] if pad else out

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None,
                 fused: bool = False) -> jax.Array:
        """Two layouts over ONE parameter set (qkv / rpb table / proj):

        * fused=False — x: (nW, L, C) with L = ws*ws; mask
          (num_win_types, L, L) or None (pure-XLA windowed path).
        * fused=True — x: (B, Hp, Wp, C) image layout, Hp/Wp window
          multiples; the window regroup + attention run inside
          ops/pallas/window_attn.py, skipping XLA's partition/unpartition
          relayouts entirely; mask is the full per-window (nH*nW, L, L).
        """
        c = x.shape[-1]
        h = self.num_heads
        hd = c // h
        ws = self.window_size
        l = ws * ws
        qkv = _dense(3 * c, "qkv", ("swin_embed", "swin_heads"),
                     self.partition)(x)
        bias = self._rpb_bias(l)

        if fused:
            from ..ops.pallas.window_attn import window_attention_pallas

            out = window_attention_pallas(qkv, bias.astype(jnp.float32),
                                          mask, h, ws, _fused_interpret())
        elif _use_wattn_math(h, x.shape[0], self.partition):
            # attention math in ONE VMEM pass per window block: the
            # (nw, h, L, L) attention tensor never hits HBM (opt-in —
            # see _use_wattn_math for why the default stays XLA)
            from ..ops.pallas.win_attn_math import window_attn_math

            import os
            out = window_attn_math(
                qkv, bias.astype(jnp.float32),
                None if mask is None else mask.astype(jnp.float32), h,
                os.environ.get("POLY_WATTN_MATH") == "interpret")
        elif _use_wattn_pair(x.shape[0], l):
            out = self._paired_attention(qkv, bias, mask, c, h, hd, l,
                                         x.dtype)
        else:
            nw = x.shape[0]
            # head split WITHOUT materialized transposes: slice q/k/v from
            # the channel axis and let the dots carry the (window, head)
            # batch dims — the explicit (nw,l,3,h,hd)->(3,nw,h,l,hd)
            # transpose was a full-volume relayout
            # (tools_dev/bench_swin_parts.py)
            q = qkv[..., :c].reshape(nw, l, h, hd)
            k = qkv[..., c:2 * c].reshape(nw, l, h, hd)
            v = qkv[..., 2 * c:].reshape(nw, l, h, hd)
            attn = jnp.einsum("wqhd,wkhd->whqk", q, k) / np.sqrt(hd)
            attn = attn + bias[None]
            if mask is not None:
                ntypes = mask.shape[0]
                attn = attn.reshape(nw // ntypes, ntypes, h, l, l) \
                    + mask[None, :, None]
                attn = attn.reshape(nw, h, l, l)
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=-1).astype(x.dtype)
            out = jnp.einsum("whqk,wkhd->wqhd", attn, v).reshape(nw, l, c)
        return _dense(c, "proj", ("swin_heads", "swin_embed"),
                      self.partition)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    partition: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        # pad to window multiples (standard Swin behavior; cropped after)
        hp = (h + ws - 1) // ws * ws
        wp = (w + ws - 1) // ws * ws
        if (hp, wp) != (h, w):
            y = jnp.pad(y, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        # opt-in experimental path (see _use_fused_window_attn); capped at
        # 12 heads — deeper stages' many blocks x high head counts make the
        # unrolled kernel expensive to compile
        fused = (not self.partition) and self.num_heads <= 12 \
            and _use_fused_window_attn()
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, self.shift),
                               dtype=jnp.float32 if fused else x.dtype)
        else:
            mask = None
        attn_mod = WindowAttention(self.dim, self.num_heads, ws,
                                   partition=self.partition, name="attn")
        if fused:
            y = attn_mod(y, mask, fused=True)
        else:
            win = attn_mod(window_partition(y, ws), mask)
            y = window_unpartition(win, ws, (hp, wp))
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        z = _dense(int(c * self.mlp_ratio), "mlp_fc1",
                   ("swin_embed", "swin_mlp"), self.partition)(z)
        z = nn.gelu(z, approximate=False)  # exact erf: torch nn.GELU default
        z = _dense(c, "mlp_fc2", ("swin_mlp", "swin_embed"),
                   self.partition)(z)
        return x + z


class PatchMerging(nn.Module):
    out_dim: int
    partition: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return _dense(self.out_dim, "reduction", ("swin_merge", "swin_embed"),
                      self.partition, use_bias=False)(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    partition: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        """x: (B, H, W, 3), H/W divisible by 4*window_size*8. Returns 4
        levels at strides 4/8/16/32 (LayerNorm'd, like mmdet's out_norm)."""
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4),
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        outs = []
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                x = SwinBlock(dim, self.num_heads[stage],
                              window_size=self.window_size,
                              shift=0 if blk % 2 == 0 else self.window_size // 2,
                              partition=self.partition,
                              name=f"stage{stage}_block{blk}")(x)
            outs.append(nn.LayerNorm(epsilon=1e-5, name=f"out_norm{stage}")(x))
            if stage < len(self.depths) - 1:
                dim *= 2
                x = PatchMerging(dim, partition=self.partition,
                                 name=f"merge{stage}")(x)
        return tuple(outs)


def swin_tiny() -> SwinTransformer:
    return SwinTransformer(96, (2, 2, 6, 2), (3, 6, 12, 24))


def swin_large() -> SwinTransformer:
    return SwinTransformer(192, (2, 2, 18, 2), (6, 12, 24, 48))
