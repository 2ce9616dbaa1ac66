"""Analytic roofline accounting for the train-step stages (VERDICT r4 #2).

Makes "speed-of-light" falsifiable: for each stage of the splat train step we
compute the two hardware floors on one TPU v5 lite chip —

  t_hbm  = bytes_moved / HBM_BW        (bandwidth floor)
  t_vpu  = vpu_ops / VPU_PEAK          (elementwise-compute floor)
  t_mxu  = mxu_flops / MXU_PEAK_F32    (matmul floor)

  roofline_ms = max(t_hbm, t_vpu, t_mxu);  frac = roofline_ms / measured_ms

``frac`` near 1.0 means the stage runs at the speed of its binding resource;
a low ``frac`` quantifies exactly how far from speed-of-light it is and the
binding resource names what to fix.

Hardware model (documented assumptions, one v5e chip):
  * HBM_BW = 819 GB/s (public v5e spec).
  * MXU: 197 Tflop/s bf16; fp32 at HIGHEST precision lowers to multi-pass
    bf16 (6 passes) -> ~33 Tflop/s effective. Our kernels' dots are fp32
    HIGHEST (bit-comparability with the XLA goldens).
  * VPU: 8x128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85 T single-op/s fp32 upper
    bound (4-way issue, ops counted as 1/element/pass — FMA-fusable pairs
    already counted as one pass, so the FMA x2 does not apply). We count
    each elementwise [chunk, P] traversal as one "pass", transcendental exp
    as 8 op-equivalents. Round-5 ablations (BENCH_SCALE.md) measured the
    stream kernels running within ~2x of the SINGLE-issue floor (0.96 T/s),
    so a frac near 0.25 on this 4-issue model is already near what Pallas
    scheduling achieves in practice; the HBM floor is exact given the
    traffic model.

Byte/op models are derived from the actual kernel structure in
render/stream.py, render/project.py, render/tiles.py — see the per-stage
builders below. Reference workload being modeled: the CUDA rasterizer train
loop at /root/reference/train.py:156-191.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

HBM_BW = 819e9  # B/s
MXU_F32_HIGHEST = 33e12  # flop/s (197 Tflop/s bf16 / 6-pass fp32 emulation)
VPU_PEAK = 3.85e12  # single-op/s upper bound, fp32 (4-way issue; see header)


class StageRoofline(NamedTuple):
    hbm_bytes: float
    vpu_ops: float
    mxu_flops: float

    @property
    def t_hbm_ms(self):
        return self.hbm_bytes / HBM_BW * 1e3

    @property
    def t_vpu_ms(self):
        return self.vpu_ops / VPU_PEAK * 1e3

    @property
    def t_mxu_ms(self):
        return self.mxu_flops / MXU_F32_HIGHEST * 1e3

    @property
    def roofline_ms(self):
        return max(self.t_hbm_ms, self.t_vpu_ms, self.t_mxu_ms)

    @property
    def bound(self):
        t = {"hbm": self.t_hbm_ms, "vpu": self.t_vpu_ms, "mxu": self.t_mxu_ms}
        return max(t, key=t.get)


# [chunk, P] elementwise pass-equivalents per instance row, counted from
# render/stream.py (v5 kernels, fp32 path, FMA power eval):
#   forward:  alpha eval ~18 (power 5 FMA + min/exp(8)/opac/cap/skip-mask)
#             + exclusive cumprod 1+log2(chunk) + termination ~8 + w 2
#             + carry ~1  ->  ~36 with chunk=64
#   backward: replay alpha 18 + cumprod 7 + termination 8 + w 2
#             + <rgb,gC> 3 + u 1 + inclusive cumsum 7 + g_alpha chain ~8
#             + masks 4 + grad-row write pack ~2  ->  ~60 + moment path
FWD_PASSES_BASE = 29.0  # everything except the scan
BWD_PASSES_BASE = 53.0
MOM_VPU_PASSES = 11.0  # explicit monomials + row reductions (GT_MOM=vpu)
P = 256  # pixels per tile (16x16)


def fwd_kernel(i_pad: int, chunk: int, n_tiles: int) -> StageRoofline:
    """Stream-compositor forward: reads the [I_pad, 16] f32 property block,
    writes [T, 4, P]; per-row VPU work as counted above; the color
    accumulation is an MXU dot [3, chunk] x [chunk, P] per chunk."""
    passes = FWD_PASSES_BASE + (1 + _log2(chunk))
    return StageRoofline(
        hbm_bytes=i_pad * 16 * 4 + n_tiles * 4 * P * 4,
        vpu_ops=i_pad * P * passes,
        mxu_flops=i_pad * P * 3 * 2,  # 2*3*chunk*P per chunk, /chunk rows
    )


def bwd_kernel(i_pad: int, chunk: int, n_tiles: int, mom_mxu: bool = True) -> StageRoofline:
    """Backward replay: reads props [I_pad,16] + per-tile residual table
    [T, 8, P], writes d-props [I_pad, 16]; two scans; moment contraction
    either an MXU dot ([chunk,P]x[P,8] per chunk) or ~11 VPU passes."""
    passes = BWD_PASSES_BASE + 2 * (1 + _log2(chunk))
    if not mom_mxu:
        passes += MOM_VPU_PASSES
    mxu = i_pad * P * 3 * 2 * 2  # d_rgb + rgb-contraction-scale dots
    if mom_mxu:
        mxu += i_pad * P * 8 * 2
    return StageRoofline(
        hbm_bytes=i_pad * 16 * 4 * 2 + n_tiles * 8 * P * 4,
        vpu_ops=i_pad * P * passes,
        mxu_flops=mxu,
    )


def project(c: int, sh_deg: int = 1) -> StageRoofline:
    """SoA EWA projection (render/project.py): reads the per-Gaussian
    learnables, writes the projected splat rows; ~500 scalar flops/row
    (quat->R, covariance chain, SH eval)."""
    feat = (sh_deg + 1) ** 2 * 3 * 4
    read = c * (12 + 12 + 16 + 4 + feat)
    write = c * (8 + 4 + 12 + 12 + 8 + 4)
    return StageRoofline(hbm_bytes=read + write, vpu_ops=c * 500, mxu_flops=0)


def binning(i: int, i_pad: int, c: int) -> StageRoofline:
    """bin_stream (render/tiles.py v4): rect expansion row-gather, one stable
    two-key sort over [I] (key 8B + payload 4B, ~20 effective HBM passes for
    the TPU bitonic lowering — calibrated against the measured 2 ms at 2.7M
    rows), rank/offset scans and three flat scatters over [I]/[I_pad]."""
    sort_bytes = i * 12 * 20
    expand = c * 16 + i * 16 * 2
    scatters = i_pad * 4 * 3 + i * 4 * 4
    return StageRoofline(
        hbm_bytes=sort_bytes + expand + scatters, vpu_ops=i * 40, mxu_flops=0
    )


def loss_adam(c: int, h: int, w: int, sh_deg: int = 1) -> StageRoofline:
    """L1 + fused-SSIM loss (fwd+bwd over [3, H, W]) + Adam update over every
    learnable (read p/m/v + grad, write p/m/v)."""
    img_passes = 30  # SSIM 11x11 separable stack fwd+bwd + L1
    feat = (sh_deg + 1) ** 2 * 3 * 4
    param_bytes = c * (12 + 12 + 16 + 4 + feat)
    return StageRoofline(
        hbm_bytes=h * w * 3 * 4 * img_passes + param_bytes * 7,
        vpu_ops=h * w * 3 * img_passes + c * 100,
        mxu_flops=0,
    )


def _log2(n):
    k = 0
    while (1 << k) < n:
        k += 1
    return float(k)


def step_report(counts: Dict[str, int], measured_ms: Dict[str, float] | None = None):
    """Build {stage: {roofline_ms, bound, frac?}} for one train step.

    counts: n_gaussians, n_instances, i_pad (padded stream rows), chunk,
    n_tiles, height, width. measured_ms: optional per-stage measurements to
    compute roofline fractions against.
    """
    c = counts["n_gaussians"]
    i = counts["n_instances"]
    i_pad = counts["i_pad"]
    chunk = counts["chunk"]
    t = counts["n_tiles"]
    h, w = counts["height"], counts["width"]
    stages = {
        "project": project(c),
        "bin": binning(i, i_pad, c),
        "fwd_kernel": fwd_kernel(i_pad, chunk, t),
        "bwd_kernel": bwd_kernel(i_pad, chunk, t),
        "loss_adam": loss_adam(c, h, w),
    }
    out = {}
    total_roof = 0.0
    for name, r in stages.items():
        row = {
            "roofline_ms": round(r.roofline_ms, 3),
            "bound": r.bound,
            "t_hbm_ms": round(r.t_hbm_ms, 3),
            "t_vpu_ms": round(r.t_vpu_ms, 3),
            "t_mxu_ms": round(r.t_mxu_ms, 3),
        }
        total_roof += r.roofline_ms
        if measured_ms and name in measured_ms and measured_ms[name] > 0:
            row["measured_ms"] = round(measured_ms[name], 2)
            row["roofline_frac"] = round(r.roofline_ms / measured_ms[name], 3)
        out[name] = row
    out["_total"] = {"roofline_ms": round(total_roof, 2)}
    if measured_ms and "total" in measured_ms:
        out["_total"]["measured_ms"] = round(measured_ms["total"], 2)
        out["_total"]["roofline_frac"] = round(total_roof / measured_ms["total"], 3)
    return out
