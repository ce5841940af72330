"""Closed-form FLOP hand-count of the flagship train step's conv stack,
to validate bench.py's `_analytic_step_flops` HLO-derived denominator
(VERDICT r4 weak #7: an XLA CPU-lowering artifact could silently skew the
headline MFU and nothing pinned it).

Counts multiply-adds as 2 FLOPs, convs as 2*H*W*K*K*Cin*Cout per sample, and
the backward pass as +2x the forward conv cost (dgrad + wgrad are each one
conv-sized contraction; bias/BN/elementwise are O(HWC) and counted at zero).
Matmul (PFN) layers count 2*N*Cin*Cout likewise.  The result is the
unfuseable algorithmic floor; the HLO count from the XLA reference lowering
sits above it by the segment/scatter/stamp ops' non-matmul work.

Usage: python tools/perf/flops_handcount.py   (pure python, no jax)
"""
from __future__ import annotations

BATCH = 2
N_POINTS = 163840
GRID = 468

# BaseBEVBackbone (configs/waymo_models/com/centerpoint_pillar_3cls_com.yaml)
LAYER_NUMS = [3, 5, 5]
LAYER_STRIDES = [1, 2, 2]
NUM_FILTERS = [64, 128, 256]
UPSAMPLE_STRIDES = [1, 2, 4]
NUM_UPSAMPLE = [128, 128, 128]
IN_CH = 64

# CurriculumCenterHead_x5: shared 3x3 384->64, then 6 branches (hm + 5 box
# regressions), each num_conv=2: one 3x3 64->64 + one 3x3 64->out
HEAD_BRANCH_OUT = {"hm": 3, "center": 2, "center_z": 1, "dim": 3, "rot": 2,
                   "iou": 1}


def conv_flops(h, w, k, cin, cout, stride=1):
    return 2 * (h // stride) * (w // stride) * k * k * cin * cout


def backbone_flops():
    tot = 0
    h = GRID
    cin = IN_CH
    for n, s, c, us, uc in zip(LAYER_NUMS, LAYER_STRIDES, NUM_FILTERS,
                               UPSAMPLE_STRIDES, NUM_UPSAMPLE):
        # entry conv at stride s, then n more 3x3s at the stage resolution
        tot += conv_flops(h, h, 3, cin, c, stride=s)
        h //= s
        tot += n * conv_flops(h, h, 3, c, c)
        # deconv/upsample back to GRID resolution: K=us (transpose conv),
        # output at h*us; cost = 2 * (h*us)^2 * K*K*C*UC / us^2 = 2*h^2*K^2*C*UC
        tot += 2 * h * h * us * us * c * uc
        cin = c
    return tot


def head_flops():
    h = GRID
    cin = sum(NUM_UPSAMPLE)  # 384 concat
    tot = conv_flops(h, h, 3, cin, 64)  # shared conv
    for out in HEAD_BRANCH_OUT.values():
        tot += conv_flops(h, h, 3, 64, 64) + conv_flops(h, h, 3, 64, out)
    return tot


def vfe_flops():
    # PFN: two dense layers over every point: 11->64, 64->64 (after
    # decoration the point feature is 11-wide)
    return 2 * N_POINTS * (11 * 64 + 64 * 64)


def main():
    fwd = BATCH * (backbone_flops() + head_flops() + vfe_flops())
    total = 3 * fwd  # bwd = dgrad + wgrad ~= 2x fwd for conv/matmul stacks
    print(f"fwd conv/matmul FLOPs  : {fwd/1e12:.3f} TFLOP")
    print(f"train step (fwd+bwd)   : {total/1e12:.3f} TFLOP")
    print("compare: bench.py step_tflops (HLO count of the XLA reference "
          "lowering)")


if __name__ == "__main__":
    main()
