"""Pallas TPU stream compositor: chunked padded-CSR front-to-back compositing.

Second-generation replacement for the [T, K]-table kernel in
pallas_composite.py (both replace the render/backward stage of the reference's
CUDA rasterizer, ``/root/reference/gaussian_renderer/__init__.py:85-93``).
Instead of gathering a [T, K, 16] per-tile property table (T*K rows of HBM
traffic and a hard per-tile K cap), the compositor walks the instance stream
directly:

  * binning (tiles.bin_stream) lays every tile's depth-ordered instance run
    contiguously in one [I_pad] stream, padded so each chunk-row block belongs
    to exactly ONE tile; property rows are gathered once at instance
    granularity ([I_pad, 16] — ~8x less traffic than the table),
  * the kernel grid is one program per chunk; Pallas double-buffers the
    [chunk, 16] property blocks automatically, and the output block index is
    the chunk's tile id (scalar-prefetched), so consecutive chunks of the same
    tile keep the accumulator in VMEM — the transmittance recurrence carries
    across programs through the out refs + a live-mask scratch,
  * per-tile instance counts are UNCAPPED: a tile may span any number of
    chunks (the reference's variable-length lists, without the GPU's dynamic
    allocation),
  * exact upstream semantics preserved (alpha cap 0.99, 1/255 skip floor,
    termination before the contribution that drops T below 1e-4), verified by
    the same golden/naive equivalence tests as the table kernel,
  * the backward kernel replays the forward per chunk and writes per-instance
    gradient rows [chunk, 16] to its OWN block — no scatter conflicts; the
    pullback to per-Gaussian arrays is one segment add over stream_gauss.

Property row layout matches pallas_composite (PROPS_F = 16):
  0: x  1: y  2: conic_a  3: conic_b  4: conic_c  5: r  6: g  7: b  8: opacity
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_transformer_tpu.render.tiles import TILE
from gaussian_transformer_tpu.render.pallas_composite import (
    CH,
    PROPS_F,
    _exclusive_cumprod_rows,
    _inclusive_cumsum_rows,
    _inclusive_or_rows,
    _pixel_coords,
    _row_product,
    _use_interpret,
    pack_props,
)

# The chunk size (stream layout granularity = kernel block rows) is inferred
# per call as I_pad // len(chunk_tile); bin_stream picks it so the SMEM-resident
# chunk->tile map stays small on large scenes. CH (=32) is the floor.
P = TILE * TILE


def _local_pixel_coords():
    """Tile-LOCAL pixel centers [1, P] (0..TILE-1 each axis) — the bf16 path
    stores tile-local splat means so 8 mantissa bits cover the coordinate
    range; the fp32 path keeps the global frame (bit-stable with the XLA
    golden)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    return (p % TILE).astype(jnp.float32), (p // TILE).astype(jnp.float32)


def _localize_props(props, chunk_tile, grid_w, chunk):
    """Shift x/y rows into their tile's local frame (exact: origins are
    multiples of TILE). Gradient-transparent — translation only."""
    row_tile = jnp.repeat(chunk_tile, chunk)  # [I_pad]
    ox = (row_tile % grid_w).astype(props.dtype) * TILE
    oy = (row_tile // grid_w).astype(props.dtype) * TILE
    return props.at[:, 0].add(-ox).at[:, 1].add(-oy)


def _alpha_math(blk, px, py):
    """Shared fwd/bwd alpha evaluation for one [chunk, 16] property block.
    Accepts fp32 or bf16 blocks; all math runs fp32 (bf16 saves the DMA)."""
    blk = blk.astype(jnp.float32)
    x = blk[:, 0:1]
    y = blk[:, 1:2]
    a = blk[:, 2:3]
    b = blk[:, 3:4]
    c = blk[:, 4:5]
    opac = blk[:, 8:9]
    rgb = blk[:, 5:8]

    dx = x - px  # [chunk, P]
    dy = y - py
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha_raw = opac * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(0.99, alpha_raw)
    skip = (power > 0.0) | (alpha < (1.0 / 255.0))
    alpha = jnp.where(skip, 0.0, alpha)
    return alpha, alpha_raw, rgb, dx, dy, a, b, c, opac


def _fwd_kernel(chunk_tile_ref, props_ref, color_ref, t_ref, live_ref, *, grid_w, local_coords=False):
    g = pl.program_id(0)
    t = chunk_tile_ref[g]
    prev = chunk_tile_ref[jnp.maximum(g - 1, 0)]
    is_first = (g == 0) | (t != prev)

    @pl.when(is_first)
    def _():
        color_ref[0] = jnp.zeros((3, P), jnp.float32)
        t_ref[0] = jnp.ones((1, P), jnp.float32)
        live_ref[:] = jnp.ones((1, P), jnp.float32)

    t_run = t_ref[0]
    live = live_ref[:]

    # Whole-tile early out: every pixel saturated -> the remaining chunks of
    # this tile cannot contribute (their DMA still streams, compute is skipped).
    @pl.when(jnp.max(t_run * live) >= 1e-4)
    def _():
        px, py = _local_pixel_coords() if local_coords else _pixel_coords(t, grid_w)
        alpha, _, rgb, *_ = _alpha_math(props_ref[:], px, py)

        t_in = _exclusive_cumprod_rows(1.0 - alpha) * t_run
        trigger = (alpha > 0.0) & (t_in * (1.0 - alpha) < 1e-4)
        done_inc = _inclusive_or_rows(trigger.astype(jnp.float32)) > 0.0
        live_k = jnp.where(done_inc, 0.0, live)

        w = alpha * t_in * live_k
        color_ref[0] = color_ref[0] + jax.lax.dot_general(
            rgb, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # full-f32 MXU passes: keep the
            # color accumulation bit-comparable with the XLA/golden references
        )
        t_ref[0] = t_run * _row_product(1.0 - alpha * live_k)
        live_ref[:] = live * (1.0 - done_inc[-1:].astype(jnp.float32))


def _bwd_kernel(
    chunk_tile_ref, props_ref, color_ref, final_t_ref, g_color_ref, g_t_ref,
    dprops_ref, pref_ref, t_scr, live_scr, *, grid_w, local_coords=False,
):
    """Replay one chunk and emit its per-instance grads (math identical to
    pallas_composite._bwd_one_tile, carried across programs via scratch)."""
    g = pl.program_id(0)
    t = chunk_tile_ref[g]
    prev = chunk_tile_ref[jnp.maximum(g - 1, 0)]
    is_first = (g == 0) | (t != prev)

    @pl.when(is_first)
    def _():
        pref_ref[:] = jnp.zeros((3, P), jnp.float32)
        t_scr[:] = jnp.ones((1, P), jnp.float32)
        live_scr[:] = jnp.ones((1, P), jnp.float32)

    t_run = t_scr[:]
    live = live_scr[:]
    active = jnp.max(t_run * live) >= 1e-4

    @pl.when(active)
    def _():
        px, py = _local_pixel_coords() if local_coords else _pixel_coords(t, grid_w)
        alpha, alpha_raw, rgb, dx, dy, a, b, c, opac = _alpha_math(props_ref[:], px, py)
        g_color = g_color_ref[0]  # [3, P]
        g_t = g_t_ref[0]  # [1, P]
        t_final = final_t_ref[0]
        c_total = color_ref[0]

        t_in = _exclusive_cumprod_rows(1.0 - alpha) * t_run
        trigger = (alpha > 0.0) & (t_in * (1.0 - alpha) < 1e-4)
        done_inc = _inclusive_or_rows(trigger.astype(jnp.float32)) > 0.0
        live_k = jnp.where(done_inc, 0.0, live)
        w = alpha * t_in * live_k

        d_rgb = jax.lax.dot_general(
            w, g_color, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        one_minus = jnp.maximum(1.0 - alpha, 1e-6)
        g_alpha = -g_t * t_final / one_minus
        color_pref = pref_ref[:]
        chunk_totals = []
        for ch3 in range(3):
            contrib_c = w * rgb[:, ch3 : ch3 + 1]
            prefix_c = _inclusive_cumsum_rows(contrib_c)
            suffix_c = (c_total[ch3 : ch3 + 1] - color_pref[ch3 : ch3 + 1]) - prefix_c
            g_alpha = g_alpha + g_color[ch3 : ch3 + 1] * (
                rgb[:, ch3 : ch3 + 1] * t_in - suffix_c / one_minus
            )
            chunk_totals.append(prefix_c[-1:])
        g_alpha = g_alpha * live_k * jnp.where(alpha > 0.0, 1.0, 0.0)

        capped = alpha_raw > 0.99
        g_alpha = jnp.where(capped, 0.0, g_alpha)
        g_power = g_alpha * alpha
        opac_safe = jnp.maximum(opac, 1e-12)
        g_opac_px = g_alpha * alpha / opac_safe

        g_dx = g_power * (-(a * dx) - b * dy)
        g_dy = g_power * (-(c * dy) - b * dx)
        g_a = g_power * (-0.5 * dx * dx)
        g_b = g_power * (-(dx * dy))
        g_c = g_power * (-0.5 * dy * dy)

        def rsum(v):
            return jnp.sum(v, axis=1, keepdims=True)

        zeros1 = jnp.zeros((props_ref.shape[0], 1), jnp.float32)
        dprops_ref[:] = jnp.concatenate(
            [
                rsum(g_dx), rsum(g_dy), rsum(g_a), rsum(g_b), rsum(g_c),
                d_rgb, rsum(g_opac_px),
                zeros1, zeros1, zeros1, zeros1, zeros1, zeros1, zeros1,
            ],
            axis=1,
        )

        pref_ref[:] = color_pref + jnp.concatenate(chunk_totals, axis=0)
        t_scr[:] = t_run * _row_product(1.0 - alpha * live_k)
        live_scr[:] = live * (1.0 - done_inc[-1:].astype(jnp.float32))

    @pl.when(jnp.logical_not(active))
    def _():
        dprops_ref[:] = jnp.zeros(dprops_ref.shape, jnp.float32)


def stream_image(
    binned,  # tiles.StreamBinned
    means2d_s: jnp.ndarray,
    conics_s: jnp.ndarray,
    rgbs_s: jnp.ndarray,
    opac_s: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    grid_w: int,
    grid_h: int,
    precision: str = "fp32",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render the padded image [3, H_pad, W_pad] + transmittance map from the
    instance stream (drop-in for pallas_composite.composite_image_pallas)."""
    C = means2d_s.shape[0]
    props_full = pack_props(means2d_s, conics_s, rgbs_s, opac_s)  # [C+1, 16]
    props = props_full[binned.stream_gauss]  # [I_pad, 16]; autodiff -> segment add
    color, final_t = _composite_stream_tiles(
        props, binned.chunk_tile, grid_w, grid_h, precision
    )
    # Tiles no chunk ever wrote (empty, or fully beyond the instance budget)
    # hold garbage: background them.
    covered = binned.covered[:, None]
    final_t = jnp.where(covered, final_t[:, 0, :], 1.0)  # [T, P]
    color = jnp.where(covered[:, :, None], color, 0.0)  # [T, 3, P]
    color = color + final_t[:, None, :] * bg[None, :, None]

    img = color.reshape(grid_h, grid_w, 3, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, grid_h * TILE, grid_w * TILE)
    t_map = final_t.reshape(grid_h, grid_w, TILE, TILE)
    t_map = t_map.transpose(0, 2, 1, 3).reshape(grid_h * TILE, grid_w * TILE)
    return img, t_map


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _composite_stream_tiles(props, chunk_tile, grid_w, grid_h, precision="fp32"):
    """(color [T, 3, P], final_T [T, 1, P]) pre-background.

    ``precision="bf16"`` streams the property rows as bf16 (half the DMA
    bytes for the kernel's dominant read) with tile-local means so the 8-bit
    mantissa covers the coordinate range; all in-kernel math and the
    color/transmittance accumulators stay fp32. Documented numerics delta:
    property quantization perturbs alpha by O(1e-2) relative."""
    out = _run_fwd(props, chunk_tile, grid_w, grid_h, precision)
    return out[0], out[1]


def _kernel_props(props, chunk_tile, grid_w, chunk, precision):
    if precision == "bf16":
        return _localize_props(props, chunk_tile, grid_w, chunk).astype(jnp.bfloat16)
    return props


def _run_fwd(props, chunk_tile, grid_w, grid_h, precision="fp32"):
    I_pad, F = props.shape
    G = chunk_tile.shape[0]
    chunk = I_pad // G
    T = grid_w * grid_h
    assert F == PROPS_F and I_pad == G * chunk and chunk % CH == 0
    props = _kernel_props(props, chunk_tile, grid_w, chunk, precision)
    kernel = functools.partial(_fwd_kernel, grid_w=grid_w, local_coords=precision == "bf16")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((chunk, PROPS_F), lambda g, ct: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, P), lambda g, ct: (ct[g], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda g, ct: (ct[g], 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
    )
    color, final_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T + 1, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((T + 1, 1, P), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(chunk_tile, props)
    return color[:T], final_t[:T]


def _stream_fwd_rule(props, chunk_tile, grid_w, grid_h, precision="fp32"):
    color, final_t = _composite_stream_tiles(props, chunk_tile, grid_w, grid_h, precision)
    return (color, final_t), (props, chunk_tile, color, final_t)


def _stream_bwd_rule(grid_w, grid_h, precision, residuals, cotangents):
    props, chunk_tile, color, final_t = residuals
    g_color, g_t = cotangents
    I_pad, F = props.shape
    G = chunk_tile.shape[0]
    chunk = I_pad // G
    T = grid_w * grid_h
    props = _kernel_props(props, chunk_tile, grid_w, chunk, precision)
    # Trash row for the sentinel tile id T in the residual/cotangent tables.
    pad1 = lambda a: jnp.concatenate([a, jnp.zeros_like(a[:1])], axis=0)
    color_p, final_t_p = pad1(color), pad1(final_t)
    g_color_p, g_t_p = pad1(g_color), pad1(g_t)

    kernel = functools.partial(_bwd_kernel, grid_w=grid_w, local_coords=precision == "bf16")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((chunk, PROPS_F), lambda g, ct: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, P), lambda g, ct: (ct[g], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda g, ct: (ct[g], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, P), lambda g, ct: (ct[g], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda g, ct: (ct[g], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (chunk, PROPS_F), lambda g, ct: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((3, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    dprops = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((I_pad, PROPS_F), jnp.float32),
        interpret=_use_interpret(),
    )(chunk_tile, props, color_p, final_t_p, g_color_p, g_t_p)
    zi = _np.zeros(chunk_tile.shape, dtype=jax.dtypes.float0)
    return (dprops, zi)


_composite_stream_tiles.defvjp(_stream_fwd_rule, _stream_bwd_rule)
