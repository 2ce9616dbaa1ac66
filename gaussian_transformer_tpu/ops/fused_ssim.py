"""Fused Pallas SSIM: forward + analytical backward in two kernels.

Parity target: the reference's windowed SSIM loss
(``/root/reference/utils/loss_utils.py`` — 11x11 Gaussian window, sigma 1.5,
depthwise 'same' conv, C1=0.01^2, C2=0.03^2), identical math to
``ops.losses.ssim``.

Why a kernel: the XLA shift-accumulate SSIM materializes the 5-field filtered
intermediates (15 channels at 1080p = ~124 MB per pass) in HBM, and its AD
roughly doubles that — measured 5.6 ms forward / 12.9 ms gradient at 1080p on
the v5e chip (tools/profile_loss.py), a scale-independent tax on EVERY train
step. The fused version streams row bands through VMEM: one HBM read of the
two images, all five separable 11-tap convolutions + the SSIM map evaluated
in-register, one scalar partial sum per band. The backward recomputes the
band's filtered fields, applies the closed-form d(map)/d(mu1, mu2, m11, m22,
m12), pulls each back through the transposed (= same, symmetric window)
convolution, and combines pointwise — one image read + one gradient write,
no AD graph.

Gradient math (A = 2 mu1 mu2 + c1, B = 2 sigma12 + c2, C = mu1^2 + mu2^2 + c1,
D = sigma1^2 + sigma2^2 + c2, map = AB/CD, all per-pixel on filtered fields):

  d map/d m12 =  2 A / (C D)
  d map/d m11 = d map/d m22 = -A B / (C D^2)
  d map/d mu1 = 2 mu2 (B - A)/(C D) - 2 mu1 A B (D - C)/(C^2 D^2)
  d map/d mu2 = (symmetric, 1 <-> 2)

then, with P_* the cotangent maps (d map/d * scaled by g/N) and W the window:
  d img1 = conv(P_mu1) + 2 img1 conv(P_m11) + img2 conv(P_m12)
  d img2 = conv(P_mu2) + 2 img2 conv(P_m22) + img1 conv(P_m12)

because conv^T with a symmetric window and 'same' zero padding is the same
convolution of the (zero-padded) cotangent.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 11  # window size
HALF = K // 2
C1 = 0.01**2
C2 = 0.03**2
BH = 64  # output rows per grid program
# DMA row counts rounded to the f32 sublane tile (Mosaic requires dynamic
# memref slices 8-row aligned); the kernels only read the first BH + K - 1
# (fwd) / BH + 2(K-1) (bwd) rows of the scratch.
FROWS = (BH + K - 1 + 7) // 8 * 8
BROWS = (BH + 2 * (K - 1) + 7) // 8 * 8


def _taps() -> np.ndarray:
    from gaussian_transformer_tpu.ops.losses import _gaussian_window

    return _gaussian_window(K, 1.5).sum(axis=1).astype(np.float32)  # [K], sums to 1


def _ceil128(n: int) -> int:
    return (n + 127) // 128 * 128


def _sep_conv(x, taps, out_rows: int, out_cols: int):
    """Separable 11-tap 'valid' conv of a slab: vertical then horizontal.
    x: [out_rows + K - 1, >= out_cols + K - 1]."""
    v = None
    for k in range(K):
        t = float(taps[k]) * jax.lax.slice_in_dim(x, k, k + out_rows, axis=0)
        v = t if v is None else v + t
    h = None
    for k in range(K):
        t = float(taps[k]) * jax.lax.slice_in_dim(v, k, k + out_cols, axis=1)
        h = t if h is None else h + t
    return h


def _map_partials(mu1, mu2, m11, m22, m12):
    """SSIM map + its partials wrt the five filtered fields (see module doc)."""
    a_ = 2.0 * mu1 * mu2 + C1
    sigma12 = m12 - mu1 * mu2
    b_ = 2.0 * sigma12 + C2
    c_ = mu1 * mu1 + mu2 * mu2 + C1
    d_ = (m11 - mu1 * mu1) + (m22 - mu2 * mu2) + C2
    inv_cd = 1.0 / (c_ * d_)
    ssim_map = a_ * b_ * inv_cd
    d_m12 = 2.0 * a_ * inv_cd
    d_m11 = -ssim_map / d_
    d_m22 = d_m11
    common = ssim_map * (d_ - c_) * inv_cd
    d_mu1 = 2.0 * mu2 * (b_ - a_) * inv_cd - 2.0 * mu1 * common
    d_mu2 = 2.0 * mu1 * (b_ - a_) * inv_cd - 2.0 * mu2 * common
    return ssim_map, d_mu1, d_mu2, d_m11, d_m22, d_m12


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(img1_ref, img2_ref, out_ref, s1, s2, sem, *, taps, H, W, Wc, Wp):
    c = pl.program_id(0)
    b = pl.program_id(1)
    r0 = b * BH
    cp1 = pltpu.make_async_copy(img1_ref.at[c, pl.ds(r0, FROWS)], s1, sem.at[0])
    cp2 = pltpu.make_async_copy(img2_ref.at[c, pl.ds(r0, FROWS)], s2, sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    a = s1[:]
    bb = s2[:]
    mu1 = _sep_conv(a, taps, BH, Wc)
    mu2 = _sep_conv(bb, taps, BH, Wc)
    m11 = _sep_conv(a * a, taps, BH, Wc)
    m22 = _sep_conv(bb * bb, taps, BH, Wc)
    m12 = _sep_conv(a * bb, taps, BH, Wc)
    ssim_map, *_ = _map_partials(mu1, mu2, m11, m22, m12)

    rows = jax.lax.broadcasted_iota(jnp.int32, (BH, Wc), 0) + r0
    cols = jax.lax.broadcasted_iota(jnp.int32, (BH, Wc), 1)
    masked = jnp.where((rows < H) & (cols < W), ssim_map, 0.0)
    out_ref[c, b] = jnp.sum(masked)


def _bwd_kernel(
    g_ref, img1_ref, img2_ref, d1_ref, d2_ref, s1, s2, sem,
    *, taps, H, W, N, Ws, Wp2,
):
    c = pl.program_id(0)
    b = pl.program_id(1)
    r0 = b * BH
    cp1 = pltpu.make_async_copy(img1_ref.at[c, pl.ds(r0, BROWS)], s1, sem.at[0])
    cp2 = pltpu.make_async_copy(img2_ref.at[c, pl.ds(r0, BROWS)], s2, sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    a = s1[:]
    bb = s2[:]
    # Filtered fields on the extended slab: rows cover original rows
    # [r0-5, r0+BH+5), cols cover original cols [-5, W+5).
    slab_rows = BH + K - 1
    mu1 = _sep_conv(a, taps, slab_rows, Ws)
    mu2 = _sep_conv(bb, taps, slab_rows, Ws)
    m11 = _sep_conv(a * a, taps, slab_rows, Ws)
    m22 = _sep_conv(bb * bb, taps, slab_rows, Ws)
    m12 = _sep_conv(a * bb, taps, slab_rows, Ws)
    _, d_mu1, d_mu2, d_m11, d_m22, d_m12 = _map_partials(mu1, mu2, m11, m22, m12)

    # Cotangent maps: g * d(mean)/d(map) = g / (N*H*W) on VALID pixels only
    # (the transposed 'same' conv zero-pads the cotangent beyond the image).
    rows = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, Ws), 0) + (r0 - HALF)
    cols = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, Ws), 1) - HALF
    scale = jnp.where(
        (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W),
        g_ref[0] * (1.0 / (N * H * W)),
        0.0,
    )

    # Transposed conv of each cotangent map (same symmetric window).
    # d_m11 == d_m22 pointwise, so one transposed conv serves both.
    t_mu1 = _sep_conv(d_mu1 * scale, taps, BH, W)
    t_mu2 = _sep_conv(d_mu2 * scale, taps, BH, W)
    t_m = _sep_conv(d_m11 * scale, taps, BH, W)
    t_m12 = _sep_conv(d_m12 * scale, taps, BH, W)
    del d_m22

    # Pointwise combine with the band's pixels (scratch offset: original
    # pixel (r, j) sits at scratch [r - r0 + K-1, j + K-1]).
    ab = jax.lax.slice(a, (K - 1, K - 1), (K - 1 + BH, K - 1 + W))
    bbb = jax.lax.slice(bb, (K - 1, K - 1), (K - 1 + BH, K - 1 + W))
    d1_ref[0] = t_mu1 + 2.0 * ab * t_m + bbb * t_m12
    d2_ref[0] = t_mu2 + 2.0 * bbb * t_m + ab * t_m12


def _pallas_fwd(img, gt, interpret: bool):
    """img/gt: [N, H, W] f32 -> scalar mean SSIM."""
    N, H, W = img.shape
    taps = _taps()
    nb = -(-H // BH)
    Wc = _ceil128(max(W, 128))
    Wp = Wc + 128  # >= Wc + K - 1, lane-aligned
    Hp = nb * BH + FROWS - BH
    pad = lambda x: jnp.pad(
        x, ((0, 0), (HALF, Hp - H - HALF), (HALF, Wp - W - HALF))
    )
    sums = pl.pallas_call(
        functools.partial(_fwd_kernel, taps=taps, H=H, W=W, Wc=Wc, Wp=Wp),
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((N, nb), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((FROWS, Wp), jnp.float32),
            pltpu.VMEM((FROWS, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # The per-band live set (two input slabs + five field/filtered
            # slabs) exceeds Mosaic's default 16 MB scoped-vmem cap at
            # BH=64; the physical VMEM is far larger.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(pad(img), pad(gt))
    return jnp.sum(sums) / (N * H * W)


def _pallas_bwd(img, gt, g, interpret: bool):
    """Gradients (d_img, d_gt) of g * mean-SSIM. img/gt: [N, H, W] f32."""
    N, H, W = img.shape
    taps = _taps()
    nb = -(-H // BH)
    Ws = _ceil128(W + K - 1)
    Wp2 = Ws + 128  # >= Ws + K - 1, lane-aligned
    Hp = nb * BH + BROWS - BH
    pad = lambda x: jnp.pad(
        x, ((0, 0), (K - 1, Hp - H - (K - 1)), (K - 1, Wp2 - W - (K - 1)))
    )
    kernel = functools.partial(
        _bwd_kernel, taps=taps, H=H, W=W, N=N, Ws=Ws, Wp2=Wp2
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, BH, W), lambda c, b, g_: (c, b, 0)),
            pl.BlockSpec((1, BH, W), lambda c, b, g_: (c, b, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((BROWS, Wp2), jnp.float32),
            pltpu.VMEM((BROWS, Wp2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    d1, d2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, nb * BH, W), jnp.float32),
            jax.ShapeDtypeStruct((N, nb * BH, W), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(g.reshape(1).astype(jnp.float32), pad(img), pad(gt))
    return d1[:, :H], d2[:, :H]


# ---------------------------------------------------------------------------
# jnp fallback (same analytic backward; CPU meshes, debugging)
# ---------------------------------------------------------------------------


def _jnp_fwd(img, gt):
    from gaussian_transformer_tpu.ops.losses import _filter2d_same, _gaussian_window

    window = _gaussian_window(K, 1.5)
    fields = jnp.stack([img, gt, img * img, gt * gt, img * gt], axis=0)
    mu1, mu2, m11, m22, m12 = _filter2d_same(fields, window)
    ssim_map, *_ = _map_partials(mu1, mu2, m11, m22, m12)
    return jnp.mean(ssim_map)


def _jnp_bwd(img, gt, g):
    from gaussian_transformer_tpu.ops.losses import _filter2d_same, _gaussian_window

    N, H, W = img.shape
    window = _gaussian_window(K, 1.5)
    fields = jnp.stack([img, gt, img * img, gt * gt, img * gt], axis=0)
    mu1, mu2, m11, m22, m12 = _filter2d_same(fields, window)
    _, d_mu1, d_mu2, d_m11, _, d_m12 = _map_partials(mu1, mu2, m11, m22, m12)
    scale = g / (N * H * W)
    # d_m11 == d_m22 pointwise, so one transposed filter serves both.
    cot = jnp.stack([d_mu1, d_mu2, d_m11, d_m12], axis=0) * scale
    t_mu1, t_mu2, t_m, t_m12 = _filter2d_same(cot, window)
    d_img = t_mu1 + 2.0 * img * t_m + gt * t_m12
    d_gt = t_mu2 + 2.0 * gt * t_m + img * t_m12
    return d_img, d_gt


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------


def _resolve(backend: str) -> str:
    if backend != "auto":
        return backend
    if os.environ.get("GT_FUSED_SSIM", "1") == "0":
        return "jnp"
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


def _flatten(img):
    """CHW or BCHW -> [N, H, W]."""
    if img.ndim == 3:
        return img
    return img.reshape(-1, *img.shape[-2:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_ssim(img1, img2, backend="auto"):
    """Mean 11x11/sigma-1.5 windowed SSIM of CHW or BCHW f32 images in [0,1].

    Matches ``ops.losses.ssim(img1, img2)`` (size_average=True) with a fused
    Pallas forward/backward on TPU; ``backend``: "auto" | "pallas" |
    "pallas_interpret" | "jnp".
    """
    be = _resolve(backend)
    a, b = _flatten(img1), _flatten(img2)
    if be == "jnp":
        return _jnp_fwd(a, b)
    return _pallas_fwd(a, b, interpret=be == "pallas_interpret")


def _fused_fwd(img1, img2, backend):
    return fused_ssim(img1, img2, backend), (img1, img2)


def _fused_bwd(backend, res, g):
    img1, img2 = res
    be = _resolve(backend)
    a, b = _flatten(img1), _flatten(img2)
    if be == "jnp":
        d1, d2 = _jnp_bwd(a, b, g)
    else:
        d1, d2 = _pallas_bwd(a, b, g, interpret=be == "pallas_interpret")
    return d1.reshape(img1.shape), d2.reshape(img2.shape)


fused_ssim.defvjp(_fused_fwd, _fused_bwd)
