"""Pallas TPU kernel: per-tile front-to-back compositing with custom VJP.

TPU-native replacement for the hot render/backward stage of the reference's
CUDA rasterizer (``/root/reference/gaussian_renderer/__init__.py:85-93``). The
XLA fallback (composite.py) materializes [tiles, K, pixels] transmittance
tensors in HBM; this kernel keeps the whole recurrence in VMEM:

  * grid = one program per 16x16 tile; inputs are the tile's gathered
    instance properties [K, 16] (x, y, conic a/b/c, rgb, opacity, padding),
  * the depth-ordered list is walked in chunks of 32 with a running
    transmittance T [1, P], per-pixel saturation masks, and a whole-tile early
    exit once every pixel saturates (T < 1e-4) or the instance count is
    exhausted — work scales with the tile's REAL instance count,
  * exact upstream semantics: alpha = min(0.99, opac * exp(power)), skip when
    power > 0 or alpha < 1/255, stop before the contribution that would push
    T below 1e-4,
  * the backward kernel REPLAYS the forward recurrence (the Pallas analog of
    the CUDA backward's transmittance replay) using the saved forward color as
    the suffix-sum total, and emits per-tile-entry grads [K, 16]; a custom VJP
    on the table build pulls them back to the per-Gaussian arrays through the
    instance domain (row gather at (tile, rank) + segment add).

Property row layout (PROPS_F = 16, lanes padded):
  0: x   1: y   2: conic_a   3: conic_b   4: conic_c
  5: r   6: g   7: b         8: opacity   9..15: pad
Gradient rows in the backward output use the same slots.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_transformer_tpu.render.tiles import TILE

P = TILE * TILE  # pixels per tile
CH = 32  # instances processed per inner step
PROPS_F = 16


def _pixel_coords(t, grid_w):
    """Pixel center coordinates [1, P] for tile t (pixels at integer coords)."""
    tx = (t % grid_w).astype(jnp.float32)
    ty = (t // grid_w).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = tx * TILE + (p % TILE).astype(jnp.float32)
    py = ty * TILE + (p // TILE).astype(jnp.float32)
    return px, py


def _chunk_alpha(props_ref, tb, base, px, py):
    """Alpha/skip math for one chunk: returns (alpha [CH, P], one_minus [CH, P],
    rgb [CH, 3], dx, dy, a, b, c, opac) — all replayable in fwd and bwd.
    ``props_ref`` is the [T_BLOCK, K, 16] VMEM block ref, ``tb`` the tile
    within the block (dynamic ref slicing is the Mosaic-supported path;
    dynamic_slice on values is not)."""
    blk = props_ref[tb, pl.ds(base, CH), :]  # [CH, 16]
    x = blk[:, 0:1]
    y = blk[:, 1:2]
    a = blk[:, 2:3]
    b = blk[:, 3:4]
    c = blk[:, 4:5]
    opac = blk[:, 8:9]
    rgb = blk[:, 5:8]  # [CH, 3]

    dx = x - px  # [CH, P]
    dy = y - py
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha_raw = opac * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(0.99, alpha_raw)
    skip = (power > 0.0) | (alpha < (1.0 / 255.0))
    alpha = jnp.where(skip, 0.0, alpha)
    return alpha, alpha_raw, rgb, dx, dy, a, b, c, opac


import os

# Scan backend for the compositor kernels' leading-axis prefix ops.
# MXU mode: log-space cumprod + triangular-ones matmuls — the scan chains
# move from VPU Hillis-Steele doubling (log2(chunk) shifted concat+op steps
# per scan) onto the MXU. GT_SCAN_MXU: "0" = VPU everywhere, "1" = MXU
# everywhere, "fwd" = MXU in the forward kernel only.
#
# MEASURED NEGATIVE RESULT (round 4, repeated on-chip A/B at 1M/200k,
# BENCH_SCALE.md): MXU scans LOSE consistently — 1M fwd+bwd 319.7/320.3 ms
# (fwd mode) and 333.4 (full) vs 312.6/312.7 ms on VPU. The triangular
# matmuls at HIGHEST precision (6 bf16 passes) plus the log/exp round trips
# cost more than the log2(chunk) doubling steps they replace, and in the
# backward they contend with the kernel's two real dots. VPU stays the
# default; the branches remain for re-testing on future hardware.
_SCAN_MODE = os.environ.get("GT_SCAN_MXU", "0")
SCAN_MXU_FWD = _SCAN_MODE in ("1", "fwd")
SCAN_MXU_BWD = _SCAN_MODE == "1"


def _lower_tri(n, strict, dtype=jnp.float32):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((c < r) if strict else (c <= r)).astype(dtype)


def _exclusive_cumprod_rows(one_minus, mxu=False):
    """Exclusive prefix product along the leading (sublane) axis.

    MXU path: the operand is 1 - alpha with alpha capped at 0.99, so it lives
    in [0.01, 1] and the log-space form exp(L_strict @ log(x)) is safe; the
    HIGHEST-precision matmul keeps ~fp32 accuracy (the 0/1 matrix is exact in
    bf16, so the 3-pass decomposition error is the operand's alone)."""
    if mxu:
        lg = jnp.log(one_minus)
        Ls = _lower_tri(one_minus.shape[0], strict=True)
        s = jax.lax.dot_general(
            Ls, lg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.exp(s)
    ones_row = jnp.ones((1, one_minus.shape[1]), one_minus.dtype)
    x = jnp.concatenate([ones_row, one_minus[:-1]], axis=0)  # shift down by 1
    s = 1
    while s < x.shape[0]:
        shifted = jnp.concatenate([jnp.ones((s, x.shape[1]), x.dtype), x[:-s]], axis=0)
        x = x * shifted
        s *= 2
    return x  # [CH, P], row k = prod_{j<k} one_minus[j]


def _row_product(v, mxu=False):
    """Product over the leading axis -> [1, P] (Mosaic lacks reduce_prod).

    MXU-mode: log-space sum reduce (every call site's operand is
    1 - alpha*mask >= 0.01, alpha capped at 0.99 and masks exactly 0/1).
    VPU-mode: doubling product-scan, take the last row."""
    if mxu:
        return jnp.exp(jnp.sum(jnp.log(v), axis=0, keepdims=True))
    x = v
    s = 1
    while s < x.shape[0]:
        shifted = jnp.concatenate([jnp.ones((s, x.shape[1]), x.dtype), x[:-s]], axis=0)
        x = x * shifted
        s *= 2
    return x[-1:]


def _inclusive_or_rows(flags, mxu=False):
    """Inclusive OR-scan (as float max) along the leading axis; flags float 0/1.

    MXU path: an inclusive-ones matmul counts set flags at-or-above each row;
    0/1 values and counts <= chunk are EXACT in bf16 (8 mantissa bits cover
    integers to 256), so DEFAULT precision suffices — one MXU pass."""
    if mxu:
        Li = _lower_tri(flags.shape[0], strict=False)
        cnt = jax.lax.dot_general(
            Li, flags, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return (cnt > 0.5).astype(flags.dtype)
    x = flags
    s = 1
    while s < x.shape[0]:
        shifted = jnp.concatenate([jnp.zeros((s, x.shape[1]), x.dtype), x[:-s]], axis=0)
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def _inclusive_cumsum_rows(v, mxu=False):
    """Inclusive prefix sum along the leading (sublane) axis."""
    if mxu:
        Li = _lower_tri(v.shape[0], strict=False)
        return jax.lax.dot_general(
            Li, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    x = v
    s = 1
    while s < x.shape[0]:
        shifted = jnp.concatenate([jnp.zeros((s, x.shape[1]), x.dtype), x[:-s]], axis=0)
        x = x + shifted
        s *= 2
    return x


def _fwd_kernel(counts_ref, props_hw_ref, color_ref, t_ref, *, grid_w, t_block):
    # One program composites t_block consecutive tiles: grid scheduling and
    # block DMA amortize over the (tiny) per-tile work.
    for tb in range(t_block):
        _fwd_one_tile(counts_ref, props_hw_ref, color_ref, t_ref, tb, grid_w, t_block)


def _fwd_one_tile(counts_ref, props_hw_ref, color_ref, t_ref, tb, grid_w, t_block):
    t = pl.program_id(0) * t_block + tb
    count = counts_ref[t].astype(jnp.int32)
    px, py = _pixel_coords(t, grid_w)

    n_chunks = pl.cdiv(count, CH)

    def body(carry):
        ci, color, t_run, live = carry
        alpha, _, rgb, *_ = _chunk_alpha(props_hw_ref, tb, ci * CH, px, py)

        t_in = _exclusive_cumprod_rows(1.0 - alpha) * t_run  # [CH, P]
        # Saturation: a contribution that would push T below 1e-4 terminates
        # the pixel and is itself excluded (upstream semantics).
        trigger = (alpha > 0.0) & (t_in * (1.0 - alpha) < 1e-4)
        done_inc = _inclusive_or_rows(trigger.astype(jnp.float32)) > 0.0
        live_k = jnp.where(done_inc, 0.0, live)  # [CH, P]

        w = alpha * t_in * live_k  # [CH, P]
        color = color + jax.lax.dot_general(
            rgb, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [3, P]
        factor = 1.0 - alpha * live_k
        t_run = t_run * _row_product(factor)
        live = live * (1.0 - done_inc[-1:].astype(jnp.float32))
        return ci + 1, color, t_run, live

    def cond(carry):
        ci, _, t_run, live = carry
        return (ci < n_chunks) & (jnp.max(t_run * live) >= 1e-4)

    init = (
        jnp.int32(0),
        jnp.zeros((3, P), jnp.float32),
        jnp.ones((1, P), jnp.float32),
        jnp.ones((1, P), jnp.float32),
    )
    _, color, t_run, live = jax.lax.while_loop(cond, body, init)
    color_ref[tb] = color
    t_ref[tb] = t_run


def _bwd_kernel(
    counts_ref,
    props_hw_ref,
    color_ref,
    final_t_ref,
    g_color_ref,
    g_t_ref,
    dprops_ref,
    *,
    grid_w,
    t_block,
):
    """Forward replay with gradient emission, t_block tiles per program.

    For contribution k (weight w_k = alpha_k T_k):
      dL/drgb_k  = w_k * gC                       (summed over pixels)
      dL/dalpha_k = sum_c gC_c (rgb_kc T_k - S_kc/(1-alpha_k))
                    - gT * T_final/(1-alpha_k)
      where S_k = sum_{j>k} w_j rgb_j = C_total - prefix_incl_k, computed by
      carrying the inclusive prefix and using C_total from a first full pass.
    """
    for tb in range(t_block):
        _bwd_one_tile(
            counts_ref, props_hw_ref, color_ref, final_t_ref, g_color_ref, g_t_ref,
            dprops_ref, tb, grid_w, t_block,
        )


def _bwd_one_tile(
    counts_ref, props_hw_ref, color_ref, final_t_ref, g_color_ref, g_t_ref, dprops_ref,
    tb, grid_w, t_block,
):
    t = pl.program_id(0) * t_block + tb
    count = counts_ref[t].astype(jnp.int32)
    px, py = _pixel_coords(t, grid_w)
    g_color = g_color_ref[tb]  # [3, P]
    g_t = g_t_ref[tb]  # [1, P]
    t_final = final_t_ref[tb]  # [1, P]

    n_chunks = pl.cdiv(count, CH)
    dprops_ref[tb] = jnp.zeros_like(dprops_ref[tb])

    # The forward's (pre-background) color output IS the C_total the suffix
    # sums need — read it instead of replaying a whole forward pass.
    c_total = color_ref[tb]  # [3, P]

    # Pass 2: replay with gradient emission.
    def body2(ci, carry):
        color_pref, t_run, live = carry
        base = ci * CH
        alpha, alpha_raw, rgb, dx, dy, a, b, c, opac = _chunk_alpha(props_hw_ref, tb, base, px, py)

        t_in = _exclusive_cumprod_rows(1.0 - alpha) * t_run
        trigger = (alpha > 0.0) & (t_in * (1.0 - alpha) < 1e-4)
        done_inc = _inclusive_or_rows(trigger.astype(jnp.float32)) > 0.0
        live_k = jnp.where(done_inc, 0.0, live)
        w = alpha * t_in * live_k  # [CH, P]

        # d rgb: [CH, 3] = w @ gC^T.
        d_rgb = jax.lax.dot_general(
            w, g_color, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        # Per-channel inclusive prefix of w*rgb_c, to get the suffix S_k.
        one_minus = jnp.maximum(1.0 - alpha, 1e-6)
        g_alpha = -g_t * t_final / one_minus  # [CH, P] (T_final term)
        chunk_totals = []
        for ch3 in range(3):
            contrib_c = w * rgb[:, ch3 : ch3 + 1]  # [CH, P]
            prefix_c = _inclusive_cumsum_rows(contrib_c)
            suffix_c = (c_total[ch3 : ch3 + 1] - color_pref[ch3 : ch3 + 1]) - prefix_c
            g_alpha = g_alpha + g_color[ch3 : ch3 + 1] * (
                rgb[:, ch3 : ch3 + 1] * t_in - suffix_c / one_minus
            )
            chunk_totals.append(prefix_c[-1:])
        g_alpha = g_alpha * live_k * jnp.where(alpha > 0.0, 1.0, 0.0)

        # alpha = min(0.99, opac * exp(min(power, 0))) — cap and skip zero grads.
        capped = alpha_raw > 0.99
        g_alpha = jnp.where(capped, 0.0, g_alpha)
        # d power = g_alpha * alpha; d opac = g_alpha * exp(power) = g_alpha*alpha/opac.
        g_power = g_alpha * alpha
        opac_safe = jnp.maximum(opac, 1e-12)
        g_opac_px = g_alpha * alpha / opac_safe  # [CH, P]

        g_dx = g_power * (-(a * dx) - b * dy)
        g_dy = g_power * (-(c * dy) - b * dx)
        g_a = g_power * (-0.5 * dx * dx)
        g_b = g_power * (-(dx * dy))
        g_c = g_power * (-0.5 * dy * dy)

        def rsum(v):  # [CH, P] -> [CH, 1]
            return jnp.sum(v, axis=1, keepdims=True)

        zeros1 = jnp.zeros((CH, 1), jnp.float32)
        d_blk = jnp.concatenate(
            [
                rsum(g_dx),  # x (dx = x - px)
                rsum(g_dy),  # y
                rsum(g_a),
                rsum(g_b),
                rsum(g_c),
                d_rgb,  # r, g, b (3 cols)
                rsum(g_opac_px),
                zeros1,
                zeros1,
                zeros1,
                zeros1,
                zeros1,
                zeros1,
                zeros1,
            ],
            axis=1,
        )  # [CH, 16]
        dprops_ref[tb, pl.ds(base, CH), :] = d_blk

        color_pref = color_pref + jnp.concatenate(chunk_totals, axis=0)
        t_run = t_run * _row_product(1.0 - alpha * live_k)
        live = live * (1.0 - done_inc[-1:].astype(jnp.float32))
        return color_pref, t_run, live

    def cond2(carry):
        ci, state = carry
        _, t_run, live = state
        return (ci < n_chunks) & (jnp.max(t_run * live) >= 1e-4)

    def body2_wrap(carry):
        ci, state = carry
        return ci + 1, body2(ci, state)

    state0 = (jnp.zeros((3, P), jnp.float32), jnp.ones((1, P), jnp.float32), jnp.ones((1, P), jnp.float32))
    jax.lax.while_loop(cond2, body2_wrap, (jnp.int32(0), state0))


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


T_BLOCK = 8  # tiles per program (amortizes grid scheduling + DMA)


def _pad_tiles(arrs, T):
    pad = (-T) % T_BLOCK
    if pad == 0:
        return arrs, T
    return [jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) for a in arrs], T + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def composite_tiles_pallas(props, counts, grid_w):
    """props [T, K, 16], counts [T] float32 -> (color [T, 3, P], final_T [T, 1, P]).

    ``counts`` rides as float32 (zero cotangent) because custom_vjp cannot mark
    traced arrays as non-differentiable. Pre-background composited colors;
    blend ``color + final_T * bg`` outside.
    """
    return _fwd(props, counts, grid_w)


def _fwd(props, counts, grid_w):
    T, K, F = props.shape
    assert F == PROPS_F and K % CH == 0
    (props_p, counts_p), T_pad = _pad_tiles([props, counts], T)
    TB = T_BLOCK
    kernel = functools.partial(_fwd_kernel, grid_w=grid_w, t_block=TB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_pad // TB,),
        in_specs=[pl.BlockSpec((TB, K, PROPS_F), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((TB, 3, P), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, P), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    color, final_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, 1, P), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(counts_p, props_p)
    return color[:T], final_t[:T]


def _fwd_rule(props, counts, grid_w):
    color, final_t = _fwd(props, counts, grid_w)
    return (color, final_t), (props, counts, color, final_t)


def _bwd_rule(grid_w, residuals, cotangents):
    props, counts, color, final_t = residuals
    g_color, g_t = cotangents
    T, K, F = props.shape
    (props_p, counts_p, color_p, final_t_p, g_color_p, g_t_p), T_pad = _pad_tiles(
        [props, counts, color, final_t, g_color, g_t], T
    )
    TB = T_BLOCK
    kernel = functools.partial(_bwd_kernel, grid_w=grid_w, t_block=TB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_pad // TB,),
        in_specs=[
            pl.BlockSpec((TB, K, PROPS_F), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 3, P), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, P), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 3, P), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, P), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, K, PROPS_F), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM),
    )
    dprops = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_pad, K, PROPS_F), jnp.float32),
        interpret=_use_interpret(),
    )(counts_p, props_p, color_p, final_t_p, g_color_p, g_t_p)
    return (dprops[:T], jnp.zeros_like(counts))


composite_tiles_pallas.defvjp(_fwd_rule, _bwd_rule)


def pack_props(means2d_s, conics_s, rgbs_s, opac_s):
    """Stack per-Gaussian screen properties into the kernel layout [C+1, 16]
    (sentinel row C is all zeros so padded list entries are no-ops)."""
    C = means2d_s.shape[0]
    cols = jnp.concatenate(
        [
            means2d_s,  # 0:2
            conics_s,  # 2:5
            rgbs_s,  # 5:8
            opac_s[:, None],  # 8
            jnp.zeros((C, PROPS_F - 9), means2d_s.dtype),
        ],
        axis=1,
    )
    return jnp.concatenate([cols, jnp.zeros((1, PROPS_F), cols.dtype)], axis=0)


@jax.custom_vjp
def _build_props_table(props_full, tile_lists, inst_tile, inst_rank, inst_gauss):
    """[T, K, 16] per-tile table = props_full[tile_lists].

    Custom VJP: the automatic gather-VJP scatter-adds 2M (T*K) rows; instead we
    pull the cotangent rows back through the ~I real instances (row gather at
    (tile, rank), then a segment add over the instance->gaussian map) — several
    times cheaper on TPU."""
    return props_full[tile_lists]


def _build_props_table_fwd(props_full, tile_lists, inst_tile, inst_rank, inst_gauss):
    out = _build_props_table(props_full, tile_lists, inst_tile, inst_rank, inst_gauss)
    C1 = props_full.shape[0]
    return out, (tile_lists.shape, C1, inst_tile, inst_rank, inst_gauss)


def _build_props_table_bwd(res, g):
    (T, K), C1, inst_tile, inst_rank, inst_gauss = res
    flat = g.reshape(T * K, PROPS_F)
    idx = jnp.minimum(inst_tile * K + inst_rank, T * K - 1)
    valid = (inst_tile < T) & (inst_rank < K)
    d_inst = jnp.where(valid[:, None], flat[idx], 0.0)  # [I, 16] row gather
    d_props = jnp.zeros((C1, PROPS_F), g.dtype).at[jnp.minimum(inst_gauss, C1 - 1)].add(
        jnp.where((inst_gauss < C1 - 1)[:, None], d_inst, 0.0)
    )
    import numpy as _np

    zi = lambda shape: _np.zeros(shape, dtype=jax.dtypes.float0)
    return (d_props, zi((T, K)), zi(inst_tile.shape), zi(inst_rank.shape), zi(inst_gauss.shape))


_build_props_table.defvjp(_build_props_table_fwd, _build_props_table_bwd)


def composite_image_pallas(
    binned,  # tiles.Binned
    means2d_s: jnp.ndarray,
    conics_s: jnp.ndarray,
    rgbs_s: jnp.ndarray,
    opac_s: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    grid_w: int,
    grid_h: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for composite.composite_image via the Pallas kernel.

    The [T, K, 16] per-tile property table is built by SCATTERING the gathered
    instance rows (binned.inst_*) — gathers through tile_lists are ~4x slower
    on TPU; the VJP chain (gather at inst_gauss, scatter at (tile, rank))
    reverses to exactly the scatter-add the backward needs."""
    C = means2d_s.shape[0]
    tile_lists = binned.tile_lists
    K = tile_lists.shape[1]
    if K % CH:  # kernel chunk size; pad with sentinel entries
        tile_lists = jnp.pad(tile_lists, ((0, 0), (0, CH - K % CH)), constant_values=C)
    props_full = pack_props(means2d_s, conics_s, rgbs_s, opac_s)  # [C+1, 16]
    props = _build_props_table(
        props_full, tile_lists, binned.inst_tile, binned.inst_rank, binned.inst_gauss
    )
    color, final_t = composite_tiles_pallas(props, binned.tile_counts.astype(jnp.float32), grid_w)
    final_t = final_t[:, 0, :]  # [T, P]
    color = color + final_t[:, None, :] * bg[None, :, None]

    img = color.reshape(grid_h, grid_w, 3, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, grid_h * TILE, grid_w * TILE)
    t_map = final_t.reshape(grid_h, grid_w, TILE, TILE)
    t_map = t_map.transpose(0, 2, 1, 3).reshape(grid_h * TILE, grid_w * TILE)
    return img, t_map
