"""Pallas TPU stream compositor: chunked padded-CSR front-to-back compositing.

Third-generation kernel replacing the render/backward stage of the reference's
CUDA rasterizer (``/root/reference/gaussian_renderer/__init__.py:85-93``). The
layout is the padded-CSR instance stream built by tiles.bin_stream: every
tile's depth-ordered instance run lies contiguously at a chunk-aligned start,
property rows are gathered once at instance granularity ([I_pad, 16]).

What changed from the v2 kernel (one grid program per chunk): at realistic
scale the v2 grid was *scheduling-bound* — a 1M-Gaussian scene walked ~40k
sequential 128-row programs at ~3 us each. v3 batches ``SUPER`` chunks into
one program (one [SUPER*chunk, 16] block DMA, auto double-buffered by the
Pallas pipeline) and walks them in an in-kernel loop:

  * the chunk->tile map is scalar-prefetched; the transmittance recurrence
    carries across chunk AND program boundaries in VMEM scratch,
  * when the loop crosses a tile boundary it FLUSHES the [4, P] accumulator
    (color rows 0-2, transmittance row 3) to the tile's row of an HBM output
    via async DMA through a 2-slot staging buffer — the copy overlaps the
    next tile's compute, and an SMEM counter orders slot reuse,
  * per-tile instance counts stay UNCAPPED, and saturated tiles still skip
    all remaining compute (the block DMA streams regardless),
  * exact upstream semantics preserved (alpha cap 0.99, 1/255 skip floor,
    termination before the contribution that drops T below 1e-4), verified by
    the same golden/naive equivalence tests as the table kernel,
  * the backward kernel replays the forward per chunk, DMA-ing the finished
    tile's residual/cotangent rows ([8, P]: C_total, T_final, gC, gT) from an
    HBM table on each tile change, and writes per-instance gradient rows to
    its own [SUPER*chunk, 16] block — no scatter conflicts,
  * the pullback to per-Gaussian arrays (stream_gather) inverts the binning
    permutation with a row gather + cumsum + segment-boundary gather instead
    of a colliding scatter-add (which XLA:TPU serializes).

Property row layout matches pallas_composite (PROPS_F = 16):
  0: x  1: y  2: conic_a  3: conic_b  4: conic_c  5: r  6: g  7: b  8: opacity
"""

from __future__ import annotations

import functools
import os
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
    SCAN_MXU_BWD,
    SCAN_MXU_FWD,
    _exclusive_cumprod_rows,
    _inclusive_cumsum_rows,
    _use_interpret,
    pack_props,
)

# The chunk size (stream layout granularity) is inferred per call as
# I_pad // len(chunk_tile); bin_stream picks it so the SMEM-resident
# chunk->tile map stays small on large scenes. CH (=32) is the floor.
P = TILE * TILE

# Target property-block rows per grid program. The kernel loops over
# BLOCK_ROWS // chunk chunks per program; bigger blocks amortize grid
# scheduling and DMA issue, at 2 * BLOCK_ROWS * 16 * 4 bytes of VMEM.
BLOCK_ROWS = 2048


def _local_pixel_coords():
    """Tile-LOCAL pixel centers [1, P] (0..TILE-1 each axis). All v5 kernels
    run in the tile-local frame: x - tile_origin is EXACT in f32 (origins are
    multiples of TILE, both operands < 2^11), so dx/dy are bit-identical to
    the global-frame math while the quadratic basis stays tile-invariant."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    return (p % TILE).astype(jnp.float32), (p // TILE).astype(jnp.float32)


def _basis_rows():
    """Constant tile-local quadratic basis [8, P]: rows
    [1, px, py, px^2, py^2, px*py, 0, 0] for the GT_POWER=mxu variant
    (coef[chunk, 8] @ basis[8, P] in one dot; measured loser on v5e)."""
    px, py = _local_pixel_coords()
    one = jnp.ones((1, P), jnp.float32)
    zero = jnp.zeros((1, P), jnp.float32)
    return jnp.concatenate([one, px, py, px * px, py * py, px * py, zero, zero], axis=0)


def _power_basis():
    """Mode-tagged basis for the splat-exponent evaluation (A/B knob
    ``GT_POWER``, read at trace time). On-chip 1M-forward measurements
    (2026-08-20, kernel-only ms on top of binning):

    * ``dxdy`` (default, ~40 ms): classic dx/dy elementwise form — wins.
    * ``fma`` (~61 ms): 5 broadcast-FMA quadratic — every term is an OUTER
      product [chunk,1]x[1,P]; Mosaic pays a broadcast materialization per
      term, costing more than the dx/dy form's 2 outer ops + elementwise.
    * ``mxu`` (~49 ms): ONE [chunk,8]x[8,P] dot — K=8 wastes the 128-deep
      systolic array and HIGHEST precision multiplies the pass count.
    """
    mode = os.environ.get("GT_POWER", "dxdy")
    if mode == "mxu":
        return ("mxu", _basis_rows())
    px, py = _local_pixel_coords()
    if mode == "fma":
        return ("fma", (px, py, px * px, py * py, px * py))
    return ("dxdy", (px, py))


def _early_mode():
    """GT_EARLY: how the kernels gate per-chunk work (numerics-IDENTICAL
    choices — dead pixels contribute zero through the live/termination masks
    either way; the gate is purely a skip optimization):

    * ``lag`` (default): skip a tile's remaining chunks once every pixel is
      saturated, but read the saturation flag WRITTEN TWO CHUNKS AGO (a
      2-entry SMEM ring of (tile, saturated) records). The cross-lane
      reduce's vector→scalar readback retires during the next two chunks'
      vector work instead of stalling the branch — the tile skips from its
      2nd-saturated chunk onward (vs the 0th for ``max``), which costs at
      most 2 extra dead chunks per tile and is numerics-identical either
      way.
    * ``scalar``: gate only on the scalar trash-tile test (t < n_tiles);
      saturated tiles still compute (their contributions are zero). On-chip
      1M A/B (tools/ab_early.py, 2026-08-20): fwd −5.7 ms, fwd+bwd −9.5 ms
      vs ``max`` — the skipped work costs less than the stalling readback.
    * ``max`` : skip when every pixel is saturated — `jnp.max(t_run*live)`
      fresh at every chunk start; the readback stalls every chunk.
    * ``none`` : no gate at all.
    """
    return os.environ.get("GT_EARLY", "lag")


def _ablate():
    """GT_ABLATE: comma list of kernel blocks to stub out FOR TIMING ONLY
    (numerics become wrong; never set outside profiling runs). Tokens:
    noscan1 (transmittance cumprod), noscan2 (backward u cumsum), noterm
    (termination masks), noexp (alpha exponential), nomom (backward moment
    reductions), noasm (backward gradient assembly algebra). Used by
    tools/ablate_kernel.py to attribute in-kernel cost block by block."""
    return set(filter(None, os.environ.get("GT_ABLATE", "").split(",")))


def _basis_cols():
    """The same basis laid out [P, 8] for the backward's moment contraction
    moments[chunk, 8] = g_power[chunk, P] @ basis_cols (constructed directly
    — no in-kernel transpose)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (p % TILE).astype(jnp.float32)
    py = (p // TILE).astype(jnp.float32)
    one = jnp.ones((P, 1), jnp.float32)
    zero = jnp.zeros((P, 1), jnp.float32)
    return jnp.concatenate([one, px, py, px * px, py * py, px * py, zero, zero], axis=1)


def _localize_props(props, chunk_tile, grid_w, chunk):
    """Shift x/y rows into their tile's local frame (exact: origins are
    multiples of TILE). Gradient-transparent — translation only."""
    row_tile = jnp.repeat(chunk_tile, chunk)  # [I_pad]
    ox = (row_tile % grid_w).astype(props.dtype) * TILE
    oy = (row_tile // grid_w).astype(props.dtype) * TILE
    return props.at[:, 0].add(-ox).at[:, 1].add(-oy)


def _alpha_fused(blk, ox, oy, basis):
    """Fwd/bwd alpha evaluation for one [chunk, 16] property block, in the
    representation picked by ``_power_basis`` (measured winner: dxdy).

    The EWA exponent -0.5(a dx^2 + c dy^2) - b dx dy also expands to a
    quadratic in the tile-local pixel coordinates

      power = c0 + cx*px + cy*py - 0.5a*px^2 - 0.5c*py^2 - b*px*py
      c0 = -0.5(a x^2 + c y^2) - b x y,  cx = a x + b y,  cy = c y + b x

    which the ``fma``/``mxu`` modes evaluate (kept for re-testing on future
    hardware; both measured LOSSES on v5e — see _power_basis). Accepts fp32
    (global frame; ``ox/oy`` = tile origin) or bf16 blocks (already
    tile-local; pass ox = oy = 0). Returns tile-LOCAL x/y."""
    blk = blk.astype(jnp.float32)
    x = blk[:, 0:1] - ox
    y = blk[:, 1:2] - oy
    a = blk[:, 2:3]
    b = blk[:, 3:4]
    c = blk[:, 4:5]
    opac = blk[:, 8:9]
    rgb = blk[:, 5:8]

    c0 = -0.5 * (a * x * x + c * y * y) - b * x * y
    cx = a * x + b * y
    cy = c * y + b * x
    mode, data = basis
    if mode == "mxu":
        z = jnp.zeros_like(x)
        coef = jnp.concatenate([c0, cx, cy, -0.5 * a, -0.5 * c, -b, z, z], axis=1)
        power = jax.lax.dot_general(
            coef, data, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )  # [chunk, P]
    elif mode == "fma":
        px, py, pxx, pyy, pxy = data
        power = (
            c0 + cx * px + cy * py
            + (-0.5 * a) * pxx + (-0.5 * c) * pyy + (-b) * pxy
        )  # [chunk, P] — 5 broadcast FMAs (measured 2.2x LOSS at 1M:
        # every term is an OUTER product [chunk,1]x[1,P]; Mosaic pays a
        # broadcast materialization per term)
    else:
        px, py = data
        dx = x - px  # [chunk, P]
        dy = y - py
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    if "noexp" in _ablate():  # timing ablation: linearized alpha
        alpha_raw = opac * (1.0 + jnp.maximum(jnp.minimum(power, 0.0), -1.0))
    else:
        alpha_raw = opac * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(0.99, alpha_raw)
    skip = (power > 0.0) | (alpha < (1.0 / 255.0))
    alpha = jnp.where(skip, 0.0, alpha)
    return alpha, alpha_raw, rgb, x, y, a, b, c, opac


def _tile_origin(t, grid_w, local_coords):
    """Tile origin as f32 scalars (0 when the block is already tile-local)."""
    if local_coords:
        return jnp.float32(0.0), jnp.float32(0.0)
    ox = ((t % grid_w) * TILE).astype(jnp.float32)
    oy = ((t // grid_w) * TILE).astype(jnp.float32)
    return ox, oy


def _termination(alpha, t_in, lv):
    """Early-termination masks WITHOUT scans (v5).

    The upstream semantics: a pixel stops BEFORE the contribution that would
    drop its transmittance below 1e-4. t_in is monotone non-increasing and
    strictly decreasing across alpha>0 rows, so "first trigger and after"
    is equivalent to t_in <= t_in[first trigger] for every row that can
    contribute (alpha>0 rows between equal-t_in plateaus have alpha == 0 and
    contribute nothing either way). The or-SCAN collapses to one max-REDUCE:

      tstar  = max_k (t_in_k where trigger_k)      (0 when no trigger)
      done_k = t_in_k <= tstar
    Returns (live_k [chunk, P], tstar [1, P])."""
    trigger = (alpha > 0.0) & (t_in * (1.0 - alpha) < 1e-4)
    tstar = jnp.max(jnp.where(trigger, t_in, 0.0), axis=0, keepdims=True)
    live_k = jnp.where(t_in <= tstar, 0.0, lv)
    return live_k, tstar


def _carry_updates(alpha, t_in, t_run, lv, tstar):
    """Post-chunk transmittance / live carries (v5, scan-free).

    t_new per pixel: unchanged when already dead; t at the first trigger when
    one fired (the triggering contribution is NOT applied); otherwise the
    full-chunk product t_in[-1] * (1 - alpha[-1])."""
    t_full = t_in[-1:] * (1.0 - alpha[-1:])
    t_new = jnp.where(tstar > 0.0, tstar, t_full)
    t_new = jnp.where(lv > 0.0, t_new, t_run)
    live_new = lv * (tstar <= 0.0).astype(jnp.float32)
    return t_new, live_new


def _fwd_kernel(
    chunk_tile_ref, props_ref, out_ref, acc, live, stage, cnt, sem, sat,
    *, grid_w, n_tiles, super_, chunk, local_coords=False,
):
    pid = pl.program_id(0)
    nprog = pl.num_programs(0)

    @pl.when(pid == 0)
    def _():
        cnt[0] = 0
        sat[0] = -1
        sat[1] = -1

    def flush(tile):
        """Stage the accumulator and async-copy it to out[tile]; 2-slot
        rotation lets the DMA overlap the next tile's compute. The wait
        descriptor's destination index is irrelevant — semaphore waits match
        on transfer size only."""
        if "noflush" in _ablate():  # timing ablation: output never written
            return
        c = cnt[0]
        slot = jax.lax.rem(c, 2)

        @pl.when(c >= 2)
        def _():
            pltpu.make_async_copy(stage.at[slot], out_ref.at[0], sem.at[slot]).wait()

        stage[slot] = acc[:]
        pltpu.make_async_copy(stage.at[slot], out_ref.at[tile], sem.at[slot]).start()
        cnt[0] = c + 1

    basis = _power_basis()

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
                [jnp.zeros((3, P), jnp.float32), jnp.ones((1, P), jnp.float32)], axis=0
            )
            live[:] = jnp.ones((1, P), jnp.float32)

        t_run = acc[3:4]
        lv = live[:]

        # Whole-tile early out: every pixel saturated -> remaining chunks of
        # this tile cannot contribute. Trash-tile (padding) chunks skip too.
        em = _early_mode()
        slot2 = jax.lax.rem(g, 2)
        if em == "max":
            gate = (jnp.max(t_run * lv) >= 1e-4) & (t < n_tiles)
        elif em == "lag":
            # Saturation record written two chunks ago (same-tile check
            # makes stale entries from other tiles harmless).
            gate = (t < n_tiles) & (sat[slot2] != t)
        elif em == "scalar":
            gate = t < n_tiles
        else:
            gate = t >= 0

        @pl.when(gate)
        def _():
            ox, oy = _tile_origin(t, grid_w, local_coords)
            if "noread" in _ablate():  # timing ablation: no property load;
                # an iota stand-in (jnp.full constants and single-row
                # broadcasts both crash Mosaic lowering here)
                blk = (
                    jax.lax.broadcasted_iota(jnp.int32, (chunk, PROPS_F), 0)
                    .astype(jnp.float32) * 1e-3 + 0.1
                )
            else:
                blk = props_ref[pl.ds(s * chunk, chunk), :]
            alpha, _, rgb, *_ = _alpha_fused(blk, ox, oy, basis)

            ab = _ablate()
            if "noscan1" in ab:
                t_in = (1.0 - alpha) * t_run
            else:
                t_in = _exclusive_cumprod_rows(1.0 - alpha, mxu=SCAN_MXU_FWD) * t_run
            if "noterm" in ab:
                live_k, tstar = lv * jnp.ones_like(alpha), jnp.zeros_like(t_run)
            else:
                live_k, tstar = _termination(alpha, t_in, lv)

            w = alpha * t_in * live_k
            color = acc[0:3] + jax.lax.dot_general(
                rgb, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # full-f32 MXU passes: keep
                # the color accumulation bit-comparable with the XLA/golden refs
            )
            # (A no-saturation fast path skipping the termination masks was
            # measured a ~2.5% LOSS at 1M: saturation triggers are common in
            # the active band of real tiles, so the branch mostly misfires.)
            t_new, live_new = _carry_updates(alpha, t_in, t_run, lv, tstar)
            acc[:] = jnp.concatenate([color, t_new], axis=0)
            live[:] = live_new
            if em == "lag":
                # Record saturation for chunk g+2's gate; the readback of
                # this reduce overlaps the next two chunks' vector work.
                sat[slot2] = jnp.where(
                    jnp.max(t_new * live_new) < 1e-4, t, -1
                ).astype(jnp.int32)

        if em == "lag":
            @pl.when(jnp.logical_not(gate) & (t < n_tiles))
            def _():
                sat[slot2] = t  # skipped chunk: tile remains saturated

        return 0

    if os.environ.get("GT_UNROLL", "0") == "1":
        # Static unroll: no loop-trip mechanics, and Mosaic can software-
        # pipeline the scalar/branch latency of chunk k under chunk k-1's
        # vector work (the 1M ablation showed the loop is latency-bound,
        # not compute-bound).
        for s_ in range(super_):
            body(s_, 0)
    else:
        jax.lax.fori_loop(0, super_, body, 0)

    @pl.when(pid == nprog - 1)
    def _():
        flush(chunk_tile_ref[nprog * super_ - 1])
        # Drain outstanding staging DMAs before the kernel retires.
        c = cnt[0]

        @pl.when(c >= 2)
        def _():
            s0 = jax.lax.rem(c, 2)
            pltpu.make_async_copy(stage.at[s0], out_ref.at[0], sem.at[s0]).wait()

        @pl.when(c >= 1)
        def _():
            s1 = jax.lax.rem(c + 1, 2)
            pltpu.make_async_copy(stage.at[s1], out_ref.at[0], sem.at[s1]).wait()


def _bwd_kernel(
    chunk_tile_ref, props_ref, tiledata_ref, dprops_ref,
    tile_scr, pref, t_scr, live_scr, slot_ref, fetch_sem, sat,
    *, grid_w, n_tiles, super_, chunk, local_coords=False,
):
    """Replay chunks and emit per-instance grads (math identical to the v2
    kernel, carried across chunks and programs via scratch). The tile's
    residual/cotangent rows ([8, P]: C_total 0:3, T_final 3:4, g_color 4:7,
    g_t 7:8) come from an HBM table with a 1-chunk-lookahead double-buffered
    prefetch: the chunk map is scalar-prefetched, so the LAST chunk of every
    tile can start the NEXT tile's fetch into the other slot — the DMA
    overlaps that chunk's compute instead of stalling the tile start."""
    pid = pl.program_id(0)
    nprog = pl.num_programs(0)
    g_last = nprog * super_ - 1
    basis = _power_basis()
    basis_cols = _basis_cols()
    mom_mxu = os.environ.get("GT_MOM", "vpu") == "mxu"

    @pl.when(pid == 0)
    def _():
        sat[0] = -1
        sat[1] = -1

    def body(s, _):
        g = pid * super_ + s
        t = chunk_tile_ref[g]
        prev = chunk_tile_ref[jnp.maximum(g - 1, 0)]
        is_first = (g == 0) | (t != prev)

        nofetch = "nofetch" in _ablate()

        @pl.when(g == 0)
        def _():
            slot_ref[0] = 0

        @pl.when((g == 0) & (not nofetch))
        def _():
            cp = pltpu.make_async_copy(tiledata_ref.at[t], tile_scr.at[0], fetch_sem.at[0])
            cp.start()
            cp.wait()

        @pl.when((g > 0) & is_first & (not nofetch))
        def _():
            # The previous tile's last chunk already started this fetch into
            # the other slot; swap and wait (usually already complete).
            nxt = 1 - slot_ref[0]
            pltpu.make_async_copy(
                tiledata_ref.at[0], tile_scr.at[nxt], fetch_sem.at[nxt]
            ).wait()
            slot_ref[0] = nxt

        @pl.when(is_first)
        def _():
            pref[:] = jnp.zeros((1, P), jnp.float32)
            t_scr[:] = jnp.ones((1, P), jnp.float32)
            live_scr[:] = jnp.ones((1, P), jnp.float32)

        cur = slot_ref[0]

        # Last chunk of this tile: prefetch the next tile's rows NOW.
        nxt_t = chunk_tile_ref[jnp.minimum(g + 1, g_last)]

        @pl.when((g < g_last) & (nxt_t != t) & (not nofetch))
        def _():
            pltpu.make_async_copy(
                tiledata_ref.at[nxt_t], tile_scr.at[1 - cur], fetch_sem.at[1 - cur]
            ).start()

        t_run = t_scr[:]
        live = live_scr[:]
        em = _early_mode()
        slot2 = jax.lax.rem(g, 2)
        if em == "max":
            active = (jnp.max(t_run * live) >= 1e-4) & (t < n_tiles)
        elif em == "lag":
            active = (t < n_tiles) & (sat[slot2] != t)
        elif em == "scalar":
            active = t < n_tiles
        else:
            active = t >= 0

        @pl.when(active)
        def _():
            ox, oy = _tile_origin(t, grid_w, local_coords)
            if "noread" in _ablate():  # timing ablation: no property load;
                # an iota stand-in (jnp.full constants and single-row
                # broadcasts both crash Mosaic lowering here)
                blk = (
                    jax.lax.broadcasted_iota(jnp.int32, (chunk, PROPS_F), 0)
                    .astype(jnp.float32) * 1e-3 + 0.1
                )
            else:
                blk = props_ref[pl.ds(s * chunk, chunk), :]
            alpha, alpha_raw, rgb, x, y, a, b, c, opac = _alpha_fused(blk, ox, oy, basis)
            c_total = tile_scr[cur, 0:3]
            t_final = tile_scr[cur, 3:4]
            g_color = tile_scr[cur, 4:7]
            g_t = tile_scr[cur, 7:8]

            ab = _ablate()
            if "noscan1" in ab:
                t_in = (1.0 - alpha) * t_run
            else:
                t_in = _exclusive_cumprod_rows(1.0 - alpha, mxu=SCAN_MXU_BWD) * t_run
            if "noterm" in ab:
                live_k, tstar = live * jnp.ones_like(alpha), jnp.zeros_like(t_run)
            else:
                live_k, tstar = _termination(alpha, t_in, live)
            w = alpha * t_in * live_k

            d_rgb = jax.lax.dot_general(
                w, g_color, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

            # g_alpha needs the per-channel suffix sums S_kc only contracted
            # with g_color — and prefix-sum commutes with that linear
            # contraction, so the three per-channel scans collapse into ONE
            # scan of the scalar u_k = w_k * <rgb_k, gC>:
            #   sum_c gC_c S_kc = <gC, C_total> - gdot_pref - P_u(k).
            one_minus = jnp.maximum(1.0 - alpha, 1e-6)
            # 3-term contraction as broadcast FMAs ([chunk,1]x[1,P]) — an MXU
            # dot here measured ~2.5 ms of fixed cost at the 17.6k bench
            # point (1-2 chunks per tile amortize nothing).
            rgb_dot_gc = (
                rgb[:, 0:1] * g_color[0:1]
                + rgb[:, 1:2] * g_color[1:2]
                + rgb[:, 2:3] * g_color[2:3]
            )  # [chunk, P]: sum_c rgb_kc * gC_c(pixel)
            u = w * rgb_dot_gc
            p_u = u if "noscan2" in ab else _inclusive_cumsum_rows(u, mxu=SCAN_MXU_BWD)
            gdot_total = jnp.sum(g_color * c_total, axis=0, keepdims=True)  # [1, P]
            gdot_pref = pref[0:1]
            # Algebraically identical to the v4 form
            #   -gT*T_final/om + rgb_dot_gc*t_in - ((gdot_total-gdot_pref)-p_u)/om
            # with the two divisions fused into one and every [1, P]-only
            # term folded into B first (saves ~3 [chunk, P] passes + one
            # multi-pass f32 divide per chunk).
            b_row = (gdot_total - gdot_pref) + g_t * t_final  # [1, P]
            g_alpha = rgb_dot_gc * t_in + (p_u - b_row) / one_minus

            capped = alpha_raw > 0.99
            g_alpha = g_alpha * jnp.where(
                (alpha > 0.0) & jnp.logical_not(capped), live_k, 0.0
            )
            g_power = g_alpha * alpha  # [chunk, P]

            # Per-row gradient REDUCTIONS as one MXU moment contraction: each
            # of g_dx/g_dy/g_a/g_b/g_c is g_power times a polynomial in
            # (px, py) with per-row coefficients, so their row sums are
            # linear in the moments m_j = sum_p g_power * basis_j(p):
            #   m = [S, S px, S py, S px^2, S py^2, S px py]  (S = sum g_power)
            # — replacing ~10 [chunk, P] elementwise passes + 8 VPU row
            # reductions with ONE [chunk,P]x[P,8] matmul + [chunk,1] FMAs.
            if "nomom" in ab:
                m0, m1, m2 = g_power[:, 0:1], g_power[:, 1:2], g_power[:, 2:3]
                m3, m4, m5 = g_power[:, 3:4], g_power[:, 4:5], g_power[:, 5:6]
            elif mom_mxu:
                m = jax.lax.dot_general(
                    g_power, basis_cols, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [chunk, 8]
                m0, m1, m2 = m[:, 0:1], m[:, 1:2], m[:, 2:3]
                m3, m4, m5 = m[:, 3:4], m[:, 4:5], m[:, 5:6]
            else:
                # VPU variant (v4 form, for A/B): explicit monomial products +
                # row reductions. 5 broadcast mults + 6 row sums.
                px, py = _local_pixel_coords()
                rs = lambda v: jnp.sum(v, axis=1, keepdims=True)
                m0 = rs(g_power)
                m1 = rs(g_power * px)
                m2 = rs(g_power * py)
                m3 = rs(g_power * (px * px))
                m4 = rs(g_power * (py * py))
                m5 = rs(g_power * (px * py))
            if "noasm" in ab:
                g_dx, g_dy, g_a, g_b, g_c, g_opac = m0, m1, m2, m3, m4, m5
            else:
                s_dx = x * m0 - m1  # sum_p g_power * dx   (dx = x - px)
                s_dy = y * m0 - m2
                g_dx = -(a * s_dx + b * s_dy)
                g_dy = -(c * s_dy + b * s_dx)
                g_a = -0.5 * (x * x * m0 - 2.0 * x * m1 + m3)
                g_b = -(x * y * m0 - x * m2 - y * m1 + m5)
                g_c = -0.5 * (y * y * m0 - 2.0 * y * m2 + m4)
                opac_safe = jnp.maximum(opac, 1e-12)
                g_opac = m0 / opac_safe  # sum_p g_alpha * alpha / opac

            if "rawstore" in ab:  # timing ablation: store without the
                # 16-way column concat (keeps every gradient live via adds)
                dprops_ref[pl.ds(s * chunk, chunk), :] = (
                    g_power[:, 0:PROPS_F] + g_dx + g_dy + g_a + g_b + g_c
                    + g_opac + d_rgb[:, 0:1]
                )
            else:
                zeros1 = jnp.zeros((chunk, 1), jnp.float32)
                dprops_ref[pl.ds(s * chunk, chunk), :] = jnp.concatenate(
                    [
                        g_dx, g_dy, g_a, g_b, g_c,
                        d_rgb, g_opac,
                        zeros1, zeros1, zeros1, zeros1, zeros1, zeros1, zeros1,
                    ],
                    axis=1,
                )

            pref[0:1] = gdot_pref + p_u[-1:]
            t_new, live_new = _carry_updates(alpha, t_in, t_run, live, tstar)
            t_scr[:] = t_new
            live_scr[:] = live_new
            if em == "lag":
                sat[slot2] = jnp.where(
                    jnp.max(t_new * live_new) < 1e-4, t, -1
                ).astype(jnp.int32)

        @pl.when(jnp.logical_not(active))
        def _():
            # Skipped chunks (trash or saturated tail) have exactly zero
            # per-row gradients.
            dprops_ref[pl.ds(s * chunk, chunk), :] = jnp.zeros((chunk, PROPS_F), jnp.float32)

        if em == "lag":
            @pl.when(jnp.logical_not(active) & (t < n_tiles))
            def _():
                sat[slot2] = t  # skipped chunk: tile remains saturated

        return 0

    if os.environ.get("GT_UNROLL", "0") == "1":
        # Static unroll: no loop-trip mechanics, and Mosaic can software-
        # pipeline the scalar/branch latency of chunk k under chunk k-1's
        # vector work (the 1M ablation showed the loop is latency-bound,
        # not compute-bound).
        for s_ in range(super_):
            body(s_, 0)
    else:
        jax.lax.fori_loop(0, super_, body, 0)


@jax.custom_vjp
def stream_gather(props_full, stream_gauss, pos_unsorted, gauss_offsets, gauss_cov):
    """props_full[stream_gauss] ([I_pad, 16]) with a TPU-shaped backward.

    The automatic gather-VJP is a scatter-add over stream_gauss — millions of
    COLLIDING indices, which XLA:TPU serializes. Instead the cotangent rows
    are pulled back through the binning permutation: gather each (unsorted,
    gaussian-major) instance's stream row at ``pos_unsorted``, prefix-sum,
    and difference at each depth-sorted Gaussian's [offset, offset+cov)
    segment boundaries — gathers and one cumsum, no colliding scatter.
    """
    return props_full[stream_gauss]


def _stream_gather_fwd(props_full, stream_gauss, pos_unsorted, gauss_offsets, gauss_cov):
    out = stream_gather(props_full, stream_gauss, pos_unsorted, gauss_offsets, gauss_cov)
    return out, (props_full.shape[0], stream_gauss.shape[0], pos_unsorted, gauss_offsets, gauss_cov)


def _stream_gather_bwd(res, g):
    C1, I_pad, pos_unsorted, gauss_offsets, gauss_cov = res
    I = pos_unsorted.shape[0]
    in_stream = pos_unsorted < I_pad
    safe = jnp.minimum(pos_unsorted, I_pad - 1)
    d_unsorted = jnp.where(in_stream[:, None], g[safe], 0.0)  # [I, 16] row gather
    csum = jnp.concatenate(
        [jnp.zeros((1, PROPS_F), g.dtype), jnp.cumsum(d_unsorted, axis=0)], axis=0
    )  # [I+1, 16]; csum[k] = sum of first k rows
    lo = jnp.clip(gauss_offsets, 0, I)
    hi = jnp.clip(gauss_offsets + gauss_cov, 0, I)
    d_gauss = csum[hi] - csum[lo]  # [C, 16] per-(depth-sorted)-Gaussian totals
    d_props_full = jnp.concatenate(
        [d_gauss, jnp.zeros((1, PROPS_F), g.dtype)], axis=0
    )  # sentinel row C gets zero
    zi = lambda n: _np.zeros((n,), dtype=jax.dtypes.float0)
    return (
        d_props_full, zi(I_pad), zi(I),
        zi(gauss_offsets.shape[0]), zi(gauss_cov.shape[0]),
    )


stream_gather.defvjp(_stream_gather_fwd, _stream_gather_bwd)


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
    block_rows: int = BLOCK_ROWS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render the padded image [3, H_pad, W_pad] + transmittance map from the
    instance stream (drop-in for pallas_composite.composite_image_pallas).

    The property arrays must be in whatever order ``binned.stream_gauss``
    indexes — the ORIGINAL per-Gaussian order with the v4 bin_stream."""
    props_full = pack_props(means2d_s, conics_s, rgbs_s, opac_s)  # [C+1, 16]
    props = stream_gather(
        props_full, binned.stream_gauss, binned.pos_unsorted,
        binned.gauss_offsets, binned.gauss_cov,
    )  # [I_pad, 16]
    color, final_t = _composite_stream_tiles(
        props, binned.chunk_tile, grid_w, grid_h, precision, block_rows
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _composite_stream_tiles(props, chunk_tile, grid_w, grid_h, precision="fp32",
                            block_rows=BLOCK_ROWS):
    """(color [T, 3, P], final_T [T, 1, P]) pre-background.

    ``precision="bf16"`` streams the property rows as bf16 (half the DMA
    bytes for the kernel's dominant read) with tile-local means so the 8-bit
    mantissa covers the coordinate range; all in-kernel math and the
    color/transmittance accumulators stay fp32. Documented numerics delta:
    property quantization perturbs alpha by O(1e-2) relative."""
    chunk = props.shape[0] // chunk_tile.shape[0]
    props_k = _kernel_props(props, chunk_tile, grid_w, chunk, precision)
    out = _run_fwd(props_k, chunk_tile, grid_w, grid_h, precision, block_rows)
    return out[0], out[1]


def _kernel_props(props, chunk_tile, grid_w, chunk, precision):
    if precision == "bf16":
        return _localize_props(props, chunk_tile, grid_w, chunk).astype(jnp.bfloat16)
    return props


def _super_pad(props, chunk_tile, chunk, n_tiles, block_rows=BLOCK_ROWS):
    """Pad the stream to a whole number of SUPER-chunk programs (trash-tile
    chunks of sentinel rows). Returns (props, chunk_tile, super_)."""
    G = chunk_tile.shape[0]
    super_ = max(1, block_rows // chunk)
    g_pad = (-G) % super_
    if g_pad:
        chunk_tile = jnp.concatenate(
            [chunk_tile, jnp.full((g_pad,), n_tiles, chunk_tile.dtype)]
        )
        props = jnp.concatenate(
            [props, jnp.zeros((g_pad * chunk, props.shape[1]), props.dtype)], axis=0
        )
    return props, chunk_tile, super_


def _run_fwd(props, chunk_tile, grid_w, grid_h, precision="fp32", block_rows=BLOCK_ROWS):
    I_pad, F = props.shape
    G = chunk_tile.shape[0]
    chunk = I_pad // G
    T = grid_w * grid_h
    assert F == PROPS_F and I_pad == G * chunk and chunk % CH == 0
    # props arrive in KERNEL precision (the caller converts via _kernel_props)
    props, chunk_tile, super_ = _super_pad(props, chunk_tile, chunk, T, block_rows)
    kernel = functools.partial(
        _fwd_kernel, grid_w=grid_w, n_tiles=T, super_=super_, chunk=chunk,
        local_coords=precision == "bf16",
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunk_tile.shape[0] // super_,),
        in_specs=[
            pl.BlockSpec(
                (super_ * chunk, PROPS_F), lambda g, ct: (g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, P), jnp.float32),  # acc: color 0:3, T 3:4
            pltpu.VMEM((1, P), jnp.float32),  # live
            pltpu.VMEM((2, 4, P), jnp.float32),  # staging slots
            pltpu.SMEM((1,), jnp.int32),  # flush counter
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2,), jnp.int32),  # lagged-saturation ring (GT_EARLY=lag)
        ],
    )
    buf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T + 1, 4, P), jnp.float32),
        interpret=_use_interpret(),
    )(chunk_tile, props)
    return buf[:T, 0:3, :], buf[:T, 3:4, :]


def _stream_fwd_rule(props, chunk_tile, grid_w, grid_h, precision="fp32",
                     block_rows=BLOCK_ROWS):
    chunk = props.shape[0] // chunk_tile.shape[0]
    props_k = _kernel_props(props, chunk_tile, grid_w, chunk, precision)
    color, final_t = _run_fwd(props_k, chunk_tile, grid_w, grid_h, precision, block_rows)
    # Residual = the KERNEL-precision stream: at bf16 this halves the saved
    # bytes and the backward skips re-localizing/re-casting.
    return (color, final_t), (props_k, chunk_tile, color, final_t)


def _stream_bwd_rule(grid_w, grid_h, precision, block_rows, residuals, cotangents):
    props, chunk_tile, color, final_t = residuals
    g_color, g_t = cotangents
    I_pad, F = props.shape
    G = chunk_tile.shape[0]
    chunk = I_pad // G
    T = grid_w * grid_h
    # props residual is already in kernel precision
    props_p, chunk_tile_p, super_ = _super_pad(props, chunk_tile, chunk, T, block_rows)
    # Per-tile residual/cotangent table [T+1, 8, P] (trash row for tile id T):
    # C_total 0:3, T_final 3:4, g_color 4:7, g_t 7:8.
    pad1 = lambda a: jnp.concatenate([a, jnp.zeros_like(a[:1])], axis=0)
    tiledata = jnp.concatenate(
        [pad1(color), pad1(final_t), pad1(g_color), pad1(g_t)], axis=1
    )

    kernel = functools.partial(
        _bwd_kernel, grid_w=grid_w, n_tiles=T, super_=super_, chunk=chunk,
        local_coords=precision == "bf16",
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunk_tile_p.shape[0] // super_,),
        in_specs=[
            pl.BlockSpec(
                (super_ * chunk, PROPS_F), lambda g, ct: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # tiledata, DMA'd per tile
        ],
        out_specs=pl.BlockSpec(
            (super_ * chunk, PROPS_F), lambda g, ct: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, P), jnp.float32),  # double-buffered tile rows
            pltpu.VMEM((1, P), jnp.float32),  # gC-contracted color-prefix carry
            pltpu.VMEM((1, P), jnp.float32),  # transmittance carry
            pltpu.VMEM((1, P), jnp.float32),  # live carry
            pltpu.SMEM((1,), jnp.int32),  # resident slot
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2,), jnp.int32),  # lagged-saturation ring (GT_EARLY=lag)
        ],
    )
    dprops = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((chunk_tile_p.shape[0] * chunk, PROPS_F), jnp.float32),
        interpret=_use_interpret(),
    )(chunk_tile_p, props_p, tiledata)
    zi = _np.zeros(chunk_tile.shape, dtype=jax.dtypes.float0)
    return (dprops[:I_pad], zi)


_composite_stream_tiles.defvjp(_stream_fwd_rule, _stream_bwd_rule)
