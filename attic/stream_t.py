"""Transposed-layout stream compositor (lane-native, zero HBM staging).

tools/layout_probe.py showed (deviceless v5e compiler) that the row-major
stream kernel's dominant [I_pad, 16] operand is staged through a
128-lane-padded HBM copy — an 8x write+read amplification present in both
the v2 and v3 kernels. This variant stores the property stream TRANSPOSED,
``props_t [16, I_pad]``: the minor dim is the (huge) instance axis, so the
operand streams into the pipeline with no staging at all; the per-instance
gradient output is likewise [16, I_pad].

Orientation inside the kernel: instances live on LANES, pixels on SUBLANES —
every intermediate is [P, chunk] (256 sublanes x chunk lanes) instead of
[chunk, P]. The transmittance recurrence therefore scans along lanes
(Hillis-Steele with lane-shifted concats); the per-tile accumulator is kept
pixel-on-sublane [P, 4] and transposed once per tile at flush time so the
OUTPUT table stays [T+1, 4, P] (P minor — also lane-native).

Semantics are IDENTICAL to render/stream.py (same alpha math, skip floor,
0.99 cap, T < 1e-4 termination-before-contribution, cross-program carries,
flush-DMA accumulators, uncapped per-tile runs). Opt-in via
``RenderConfig.layout="transposed"``; the row-major kernel stays the
default until this one is measured on the chip.
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
    _use_interpret,
    pack_props,
)
from gaussian_transformer_tpu.render.stream import BLOCK_ROWS, stream_gather

P = TILE * TILE


# ---- lane-axis (axis=1) Hillis-Steele scans -------------------------------

def _excl_cumprod_lanes(one_minus):
    """Exclusive prefix product along lanes: out[:, k] = prod_{j<k} x[:, j]."""
    rows = one_minus.shape[0]
    x = jnp.concatenate(
        [jnp.ones((rows, 1), one_minus.dtype), one_minus[:, :-1]], axis=1
    )
    s = 1
    while s < x.shape[1]:
        shifted = jnp.concatenate(
            [jnp.ones((rows, s), x.dtype), x[:, :-s]], axis=1
        )
        x = x * shifted
        s *= 2
    return x


def _lane_product(v):
    """Product along lanes -> [rows, 1]."""
    x = v
    s = 1
    while s < x.shape[1]:
        shifted = jnp.concatenate(
            [jnp.ones((x.shape[0], s), x.dtype), x[:, :-s]], axis=1
        )
        x = x * shifted
        s *= 2
    return x[:, -1:]


def _incl_or_lanes(flags):
    x = flags
    s = 1
    while s < x.shape[1]:
        shifted = jnp.concatenate(
            [jnp.zeros((x.shape[0], s), x.dtype), x[:, :-s]], axis=1
        )
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def _incl_cumsum_lanes(v):
    x = v
    s = 1
    while s < x.shape[1]:
        shifted = jnp.concatenate(
            [jnp.zeros((x.shape[0], s), x.dtype), x[:, :-s]], axis=1
        )
        x = x + shifted
        s *= 2
    return x


def _pixel_coords_cols(t, grid_w):
    """Pixel centers as COLUMN vectors [P, 1] for tile t."""
    tx = (t % grid_w).astype(jnp.float32)
    ty = (t // grid_w).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = tx * TILE + (p % TILE).astype(jnp.float32)
    py = ty * TILE + (p // TILE).astype(jnp.float32)
    return px, py


def _alpha_math_t(blk, px, py):
    """Transposed alpha math: ``blk`` [16, chunk] -> everything [P, chunk]."""
    blk = blk.astype(jnp.float32)
    x = blk[0:1, :]
    y = blk[1:2, :]
    a = blk[2:3, :]
    b = blk[3:4, :]
    c = blk[4:5, :]
    rgb = blk[5:8, :]  # [3, chunk]
    opac = blk[8:9, :]

    dx = x - px  # [P, chunk]
    dy = y - py
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha_raw = opac * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(0.99, alpha_raw)
    skip = (power > 0.0) | (alpha < (1.0 / 255.0))
    alpha = jnp.where(skip, 0.0, alpha)
    return alpha, alpha_raw, rgb, dx, dy, a, b, c, opac


def _fwd_kernel_t(
    chunk_tile_ref, props_ref, out_ref, acc, live, stage, cnt, sem,
    *, grid_w, n_tiles, super_, chunk,
):
    """acc: [P, 4] scratch (color cols 0:3, T col 3); live [P, 1]; the flush
    transposes acc once per tile into the [T+1, 4, P] output row."""
    pid = pl.program_id(0)
    nprog = pl.num_programs(0)

    @pl.when(pid == 0)
    def _():
        cnt[0] = 0

    def flush(tile):
        c = cnt[0]
        slot = jax.lax.rem(c, 2)

        @pl.when(c >= 2)
        def _():
            pltpu.make_async_copy(stage.at[slot], out_ref.at[0], sem.at[slot]).wait()

        stage[slot] = acc[:].T  # [4, P] — one small transpose per tile
        pltpu.make_async_copy(stage.at[slot], out_ref.at[tile], sem.at[slot]).start()
        cnt[0] = c + 1

    def body(s, _):
        g = pid * super_ + s
        t = chunk_tile_ref[g]
        prev = chunk_tile_ref[jnp.maximum(g - 1, 0)]
        change = (g > 0) & (t != prev)

        @pl.when(change)
        def _():
            flush(prev)

        @pl.when((g == 0) | change)
        def _():
            acc[:] = jnp.concatenate(
                [jnp.zeros((P, 3), jnp.float32), jnp.ones((P, 1), jnp.float32)], axis=1
            )
            live[:] = jnp.ones((P, 1), jnp.float32)

        t_run = acc[:, 3:4]  # [P, 1]
        lv = live[:]

        @pl.when((jnp.max(t_run * lv) >= 1e-4) & (t < n_tiles))
        def _():
            px, py = _pixel_coords_cols(t, grid_w)
            blk = props_ref[:, s * chunk:(s + 1) * chunk]
            alpha, _, rgb, *_ = _alpha_math_t(blk, px, py)

            t_in = _excl_cumprod_lanes(1.0 - alpha) * t_run
            trigger = (alpha > 0.0) & (t_in * (1.0 - alpha) < 1e-4)
            done_inc = _incl_or_lanes(trigger.astype(jnp.float32)) > 0.0
            live_k = jnp.where(done_inc, 0.0, lv)

            w = alpha * t_in * live_k  # [P, chunk]
            color = acc[:, 0:3] + jax.lax.dot_general(
                w, rgb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [P, 3]
            t_new = t_run * _lane_product(1.0 - alpha * live_k)
            acc[:] = jnp.concatenate([color, t_new], axis=1)
            live[:] = lv * (1.0 - done_inc[:, -1:].astype(jnp.float32))

        return 0

    # Python unroll: Mosaic requires DYNAMIC lane offsets to be provably
    # 128-aligned; static per-iteration offsets compile for any chunk size.
    for s in range(super_):
        body(s, 0)

    @pl.when(pid == nprog - 1)
    def _():
        flush(chunk_tile_ref[nprog * super_ - 1])
        c = cnt[0]

        @pl.when(c >= 2)
        def _():
            s0 = jax.lax.rem(c, 2)
            pltpu.make_async_copy(stage.at[s0], out_ref.at[0], sem.at[s0]).wait()

        @pl.when(c >= 1)
        def _():
            s1 = jax.lax.rem(c + 1, 2)
            pltpu.make_async_copy(stage.at[s1], out_ref.at[0], sem.at[s1]).wait()


def _bwd_kernel_t(
    chunk_tile_ref, props_ref, tiledata_ref, dprops_ref,
    tile_scr, pref, t_scr, live_scr, slot_ref, fetch_sem,
    *, grid_w, n_tiles, super_, chunk,
):
    """Transposed replay. tiledata stays [T+1, 8, P] (P minor); its rows are
    transposed to pixel-on-sublane views once per tile after the fetch.
    Gradient output is [16, I_pad] (blocks [16, super_*chunk])."""
    pid = pl.program_id(0)
    nprog = pl.num_programs(0)
    g_last = nprog * super_ - 1

    def body(s, _):
        g = pid * super_ + s
        t = chunk_tile_ref[g]
        prev = chunk_tile_ref[jnp.maximum(g - 1, 0)]
        is_first = (g == 0) | (t != prev)

        @pl.when(g == 0)
        def _():
            slot_ref[0] = 0
            cp = pltpu.make_async_copy(tiledata_ref.at[t], tile_scr.at[0], fetch_sem.at[0])
            cp.start()
            cp.wait()

        @pl.when((g > 0) & is_first)
        def _():
            nxt = 1 - slot_ref[0]
            pltpu.make_async_copy(
                tiledata_ref.at[0], tile_scr.at[nxt], fetch_sem.at[nxt]
            ).wait()
            slot_ref[0] = nxt

        @pl.when(is_first)
        def _():
            pref[:] = jnp.zeros((P, 3), jnp.float32)
            t_scr[:] = jnp.ones((P, 1), jnp.float32)
            live_scr[:] = jnp.ones((P, 1), jnp.float32)

        cur = slot_ref[0]

        nxt_t = chunk_tile_ref[jnp.minimum(g + 1, g_last)]

        @pl.when((g < g_last) & (nxt_t != t))
        def _():
            pltpu.make_async_copy(
                tiledata_ref.at[nxt_t], tile_scr.at[1 - cur], fetch_sem.at[1 - cur]
            ).start()

        t_run = t_scr[:]
        live = live_scr[:]
        active = (jnp.max(t_run * live) >= 1e-4) & (t < n_tiles)

        @pl.when(active)
        def _():
            px, py = _pixel_coords_cols(t, grid_w)
            blk = props_ref[:, s * chunk:(s + 1) * chunk]
            alpha, alpha_raw, rgb, dx, dy, a, b, c, opac = _alpha_math_t(blk, px, py)
            td = tile_scr[cur].T  # [P, 8]: C_total 0:3, T_final 3, gC 4:7, gT 7
            c_total = td[:, 0:3]
            t_final = td[:, 3:4]
            g_color = td[:, 4:7]
            g_t = td[:, 7:8]

            t_in = _excl_cumprod_lanes(1.0 - alpha) * t_run
            trigger = (alpha > 0.0) & (t_in * (1.0 - alpha) < 1e-4)
            done_inc = _incl_or_lanes(trigger.astype(jnp.float32)) > 0.0
            live_k = jnp.where(done_inc, 0.0, live)
            w = alpha * t_in * live_k  # [P, chunk]

            d_rgb = jax.lax.dot_general(
                g_color, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [3, chunk]

            one_minus = jnp.maximum(1.0 - alpha, 1e-6)
            g_alpha = -g_t * t_final / one_minus  # [P, chunk]
            color_pref = pref[:]  # [P, 3]
            chunk_totals = []
            for ch3 in range(3):
                contrib_c = w * rgb[ch3 : ch3 + 1, :]
                prefix_c = _incl_cumsum_lanes(contrib_c)
                suffix_c = (c_total[:, ch3 : ch3 + 1] - color_pref[:, ch3 : ch3 + 1]) - prefix_c
                g_alpha = g_alpha + g_color[:, ch3 : ch3 + 1] * (
                    rgb[ch3 : ch3 + 1, :] * t_in - suffix_c / one_minus
                )
                chunk_totals.append(prefix_c[:, -1:])
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

            def csum(v):  # [P, chunk] -> [1, chunk] (sum over pixels)
                return jnp.sum(v, axis=0, keepdims=True)

            # Row-wise stores instead of one 14-piece axis-0 concatenate: the
            # terminal's Mosaic rejects mixed-sublane-offset tpu.concatenate
            # ("result/input offset mismatch on non-concat dimension").
            col = slice(s * chunk, (s + 1) * chunk)
            dprops_ref[0:1, col] = csum(g_dx)
            dprops_ref[1:2, col] = csum(g_dy)
            dprops_ref[2:3, col] = csum(g_a)
            dprops_ref[3:4, col] = csum(g_b)
            dprops_ref[4:5, col] = csum(g_c)
            dprops_ref[5:8, col] = d_rgb
            dprops_ref[8:9, col] = csum(g_opac_px)
            dprops_ref[9:16, col] = jnp.zeros((PROPS_F - 9, chunk), jnp.float32)

            pref[:] = color_pref + jnp.concatenate(chunk_totals, axis=1)
            t_scr[:] = t_run * _lane_product(1.0 - alpha * live_k)
            live_scr[:] = live * (1.0 - done_inc[:, -1:].astype(jnp.float32))

        @pl.when(jnp.logical_not(active))
        def _():
            dprops_ref[:, s * chunk:(s + 1) * chunk] = jnp.zeros(
                (PROPS_F, chunk), jnp.float32
            )

        return 0

    # static unroll (see the forward kernel's note on lane alignment)
    for s in range(super_):
        body(s, 0)


# ---- host-side wrappers ----------------------------------------------------

def _super_pad_t(props_t, chunk_tile, chunk, n_tiles, block_rows):
    G = chunk_tile.shape[0]
    super_ = max(1, block_rows // chunk)
    g_pad = (-G) % super_
    if g_pad:
        chunk_tile = jnp.concatenate(
            [chunk_tile, jnp.full((g_pad,), n_tiles, chunk_tile.dtype)]
        )
        props_t = jnp.concatenate(
            [props_t, jnp.zeros((PROPS_F, g_pad * chunk), props_t.dtype)], axis=1
        )
    return props_t, chunk_tile, super_


def _run_fwd_t(props_t, chunk_tile, grid_w, grid_h, block_rows):
    F, I_pad = props_t.shape
    G = chunk_tile.shape[0]
    chunk = I_pad // G
    T = grid_w * grid_h
    assert F == PROPS_F and I_pad == G * chunk and chunk % CH == 0
    props_t, chunk_tile, super_ = _super_pad_t(props_t, chunk_tile, chunk, T, block_rows)
    kernel = functools.partial(
        _fwd_kernel_t, grid_w=grid_w, n_tiles=T, super_=super_, chunk=chunk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunk_tile.shape[0] // super_,),
        in_specs=[
            pl.BlockSpec(
                (PROPS_F, super_ * chunk), lambda g, ct: (0, g), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((P, 4), jnp.float32),  # acc (pixel-major)
            pltpu.VMEM((P, 1), jnp.float32),  # live
            pltpu.VMEM((2, 4, P), jnp.float32),  # staging (output orientation)
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    buf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T + 1, 4, P), jnp.float32),
        interpret=_use_interpret(),
    )(chunk_tile, props_t)
    return buf[:T, 0:3, :], buf[:T, 3:4, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _composite_stream_tiles_t(props_t, chunk_tile, grid_w, grid_h, block_rows=BLOCK_ROWS):
    """Transposed-layout composite: props_t [16, I_pad] ->
    (color [T, 3, P], final_T [T, 1, P])."""
    out = _run_fwd_t(props_t, chunk_tile, grid_w, grid_h, block_rows)
    return out[0], out[1]


def _fwd_rule_t(props_t, chunk_tile, grid_w, grid_h, block_rows=BLOCK_ROWS):
    color, final_t = _run_fwd_t(props_t, chunk_tile, grid_w, grid_h, block_rows)
    return (color, final_t), (props_t, chunk_tile, color, final_t)


def _bwd_rule_t(grid_w, grid_h, block_rows, residuals, cotangents):
    props_t, chunk_tile, color, final_t = residuals
    g_color, g_t = cotangents
    F, I_pad = props_t.shape
    G = chunk_tile.shape[0]
    chunk = I_pad // G
    T = grid_w * grid_h
    props_p, chunk_tile_p, super_ = _super_pad_t(props_t, chunk_tile, chunk, T, block_rows)
    pad1 = lambda a: jnp.concatenate([a, jnp.zeros_like(a[:1])], axis=0)
    tiledata = jnp.concatenate(
        [pad1(color), pad1(final_t), pad1(g_color), pad1(g_t)], axis=1
    )

    kernel = functools.partial(
        _bwd_kernel_t, grid_w=grid_w, n_tiles=T, super_=super_, chunk=chunk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunk_tile_p.shape[0] // super_,),
        in_specs=[
            pl.BlockSpec(
                (PROPS_F, super_ * chunk), lambda g, ct: (0, g), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (PROPS_F, super_ * chunk), lambda g, ct: (0, g), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, P), jnp.float32),
            pltpu.VMEM((P, 3), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dprops_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PROPS_F, chunk_tile_p.shape[0] * chunk), jnp.float32),
        interpret=_use_interpret(),
    )(chunk_tile_p, props_p, tiledata)
    zi = _np.zeros(chunk_tile.shape, dtype=jax.dtypes.float0)
    return (dprops_t[:, :I_pad], zi)


_composite_stream_tiles_t.defvjp(_fwd_rule_t, _bwd_rule_t)


def stream_image_t(
    binned,
    means2d_s: jnp.ndarray,
    conics_s: jnp.ndarray,
    rgbs_s: jnp.ndarray,
    opac_s: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    grid_w: int,
    grid_h: int,
    block_rows: int = BLOCK_ROWS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for stream.stream_image using the transposed kernels. The
    gather + one XLA transpose produce the lane-native stream; its AD
    transpose is absorbed into stream_gather's pullback."""
    props_full = pack_props(means2d_s, conics_s, rgbs_s, opac_s)
    props = stream_gather(
        props_full, binned.stream_gauss, binned.pos_unsorted,
        binned.gauss_offsets, binned.gauss_cov,
    )  # [I_pad, 16]
    props_t = props.T  # one XLA transpose; the kernel then streams staging-free
    color, final_t = _composite_stream_tiles_t(
        props_t, binned.chunk_tile, grid_w, grid_h, block_rows
    )
    covered = binned.covered[:, None]
    final_t = jnp.where(covered, final_t[:, 0, :], 1.0)
    color = jnp.where(covered[:, :, None], color, 0.0)
    color = color + final_t[:, None, :] * bg[None, :, None]

    img = color.reshape(grid_h, grid_w, 3, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, grid_h * TILE, grid_w * TILE)
    t_map = final_t.reshape(grid_h, grid_w, TILE, TILE)
    t_map = t_map.transpose(0, 2, 1, 3).reshape(grid_h * TILE, grid_w * TILE)
    return img, t_map
