"""Tile binning: depth ordering + static-shape per-tile Gaussian lists.

TPU-native replacement for the GPU radix-sort binning inside the reference's
CUDA rasterizer (consumed at ``/root/reference/gaussian_renderer/__init__.py:85-93``).
The GPU builds variable-length (tile, depth)-sorted instance lists; XLA needs
static shapes, so instead we:

  1. globally sort all C Gaussians by depth once (``jax.lax.sort``) — culled
     Gaussians sort to the back via an +inf key,
  2. each Gaussian emits one instance per covered tile (computed positionally
     from a cumulative-coverage layout, no [C, R] materialization), ONE stable
     ``lax.sort`` by tile id yields contiguous depth-ordered per-tile runs,
     and per-tile lists come from contiguous-run row gathers — front-to-back
     order is inherited from the global sort; overflow drops the FARTHEST
     Gaussians, which the saturating compositor would weight least anyway.

Tile size is 16x16 pixels (matches the upstream BLOCK_X/BLOCK_Y); a 16x16 tile
flattens to 256 = 2x128 lanes, which keeps the compositor VPU-aligned.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16  # pixels per tile side
CHUNK = 32  # instance rows per compositor chunk (stream layout granularity)


def num_tiles(size: int) -> int:
    return (size + TILE - 1) // TILE


class Binned(NamedTuple):
    order: jnp.ndarray  # [C] int32 — gaussian index by ascending depth
    tile_lists: jnp.ndarray  # [T, K] int32 — indices into the SORTED arrays; C = empty
    tile_counts: jnp.ndarray  # [T] int32 — number of valid entries (pre-truncation, capped at K)
    overflow: jnp.ndarray  # [] int32 — total entries dropped by the K cap
    # Instance-domain views (length I): tile id (T = invalid), rank within the
    # tile's depth-ordered run, and the depth-sorted gaussian index. Consumers
    # building [T, K, ...] tables should SCATTER from these — far cheaper on
    # TPU than gathering 2M rows through tile_lists.
    inst_tile: jnp.ndarray
    inst_rank: jnp.ndarray
    inst_gauss: jnp.ndarray
    n_instances: jnp.ndarray  # [] int32 — true (uncapped) instance total


def compute_rects(means2d: jnp.ndarray, radii: jnp.ndarray, grid_w: int, grid_h: int):
    """Per-Gaussian covered tile range [min, max) (upstream getRect behavior).

    ``radii`` may be a scalar radius per Gaussian [C] (the upstream circle)
    or per-axis extents [C, 2] (the ellipse bounding box from
    project.Projected.rect_bin — exact-semantics shrink for anisotropic
    splats)."""
    r = radii.astype(means2d.dtype)
    rx = r[:, 0] if r.ndim == 2 else r
    ry = r[:, 1] if r.ndim == 2 else r
    min_x = jnp.clip(jnp.floor((means2d[:, 0] - rx) / TILE), 0, grid_w).astype(jnp.int32)
    min_y = jnp.clip(jnp.floor((means2d[:, 1] - ry) / TILE), 0, grid_h).astype(jnp.int32)
    max_x = jnp.clip(jnp.floor((means2d[:, 0] + rx + TILE - 1) / TILE), 0, grid_w).astype(jnp.int32)
    max_y = jnp.clip(jnp.floor((means2d[:, 1] + ry + TILE - 1) / TILE), 0, grid_h).astype(jnp.int32)
    return min_x, min_y, max_x, max_y


@functools.partial(
    jax.jit,
    static_argnames=("grid_w", "grid_h", "max_per_tile", "max_tiles_per_gaussian", "max_instances"),
)
def bin_gaussians(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    include: jnp.ndarray,
    *,
    grid_w: int,
    grid_h: int,
    max_per_tile: int,
    max_tiles_per_gaussian: int = 128,
    max_instances: int = 0,
) -> Binned:
    """Build depth-ordered per-tile index lists via an instance sort.

    The GPU rasterizer duplicates one instance per (Gaussian, covered tile) and
    radix-sorts by (tile, depth); the TPU version does the same with XLA:
    Gaussians are globally depth-sorted once, each emits up to
    ``max_tiles_per_gaussian`` (tile-id, gaussian) instances from its screen
    rect, and ONE stable ``lax.sort`` by tile id yields contiguous per-tile
    runs that inherit front-to-back order. Per-tile lists are contiguous-run
    row gathers (vmapped dynamic_slice) — no per-tile scans over all
    Gaussians, no searchsorted (which lowers poorly on TPU).

    Args:
      include: [C] bool — which Gaussians may contribute at all (radius > 0,
        alive, opacity above the 1/255 contribution floor).

    Returns ``Binned``; ``tile_lists`` entries index into depth-sorted arrays
    (i.e. apply ``order`` to projection outputs first), with ``C`` as the
    padding sentinel. ``overflow`` counts instances lost to any static cap
    (per-gaussian tile coverage, global instance budget, per-tile K).

    ``max_instances``: global (gaussian, tile) instance budget — the sort runs
    over this many elements, NOT over C*R (instances are compacted first, so
    generous coverage caps stay cheap). 0 = 16*C rounded up to 8192.
    """
    C = means2d.shape[0]
    T = grid_w * grid_h
    K = max_per_tile
    I = max_instances if max_instances > 0 else max(8192, 16 * C)

    (order, sorted_tiles, sorted_payload, counts, starts_ext, inst_rank,
     cap_overflow, total_raw) = _expand_instances(
        means2d, depths, radii, include, grid_w, grid_h, max_tiles_per_gaussian, I
    )

    # Per-tile lists: each row is the CONTIGUOUS run sorted_payload[start:start+K]
    # — vmapped dynamic_slice lowers to an efficient K-wide row gather (element
    # gathers through a [T, K] index matrix are several times slower on TPU).
    starts = starts_ext[:T]
    payload_pad = jnp.concatenate([sorted_payload, jnp.full((K,), C, jnp.int32)])
    runs = jax.vmap(
        lambda s0: jax.lax.dynamic_slice(payload_pad, (jnp.minimum(s0, I),), (K,))
    )(starts)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (T, K), 1)
    counts_capped = jnp.minimum(counts, K)
    tile_lists = jnp.where(k_iota < counts_capped[:, None], runs, C)

    overflow = cap_overflow + jnp.sum(jnp.maximum(counts - K, 0))  # per-tile K cap
    return Binned(
        order=order,
        tile_lists=tile_lists,
        tile_counts=counts_capped,
        overflow=overflow,
        inst_tile=sorted_tiles,
        inst_rank=inst_rank,
        inst_gauss=sorted_payload,
        n_instances=total_raw,
    )


def _expand_instances(means2d, depths, radii, include, grid_w, grid_h, R, I):
    """Shared binning core: depth sort + instance expansion + stable tile sort.

    Returns (order [C], sorted_tiles [I], sorted_gauss [I], counts [T],
    starts_ext [T+1], inst_rank [I], cap_overflow [], total_raw []). Instance
    arrays index into the DEPTH-SORTED per-Gaussian arrays; tile id T and
    gaussian id C are the invalid/padding sentinels.
    """
    C = means2d.shape[0]
    T = grid_w * grid_h
    order, tile_id, gauss_i, cap_overflow, total_raw, _, _ = _expand_unsorted(
        means2d, depths, radii, include, grid_w, grid_h, R, I
    )

    # Stable sort by tile id: per-tile runs inherit global front-to-back order.
    sorted_tiles, sorted_payload = jax.lax.sort_key_val(tile_id, gauss_i, is_stable=True)

    # Per-tile run boundaries via histogram + exclusive cumsum (cheaper on TPU
    # than searchsorted over the sorted keys).
    counts = jnp.zeros((T + 1,), jnp.int32).at[tile_id].add(1, mode="drop")[:T]
    starts_ext = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])  # [T+1]
    inst_rank = jnp.arange(I, dtype=jnp.int32) - starts_ext[jnp.minimum(sorted_tiles, T)]

    return (
        order, sorted_tiles, sorted_payload, counts, starts_ext, inst_rank,
        cap_overflow, total_raw,
    )


def _expand_unsorted(means2d, depths, radii, include, grid_w, grid_h, R, I):
    """Depth sort + instance expansion WITHOUT the tile sort: returns
    (order [C], tile_id [I], gauss_i [I], cap_overflow [], total_raw [],
    offsets [C], cov [C]) with instances laid out gaussian-major in depth
    order (tile T / gaussian C are the invalid sentinels). ``offsets``/``cov``
    describe each depth-sorted Gaussian's contiguous range in this layout —
    the stream compositor's gradient pullback segment-sums over them."""
    C = means2d.shape[0]
    T = grid_w * grid_h

    sort_key = jnp.where(include, depths, jnp.inf)
    order = jnp.argsort(sort_key).astype(jnp.int32)

    means2d_s = means2d[order]
    radii_s = radii[order]
    include_s = include[order]

    min_x, min_y, max_x, max_y = compute_rects(means2d_s, radii_s, grid_w, grid_h)
    w = max_x - min_x  # [C] tiles covered horizontally
    cov_raw = w * (max_y - min_y)
    cov_raw = jnp.where(include_s, cov_raw, 0)
    cov = jnp.minimum(cov_raw, R)

    # Instance layout without materializing [C, R]: gaussian i owns the
    # contiguous instance range [offsets[i], offsets[i] + cov[i]). The
    # instance -> gaussian map is scatter-max + cummax (owner of slot j is
    # max{i : offsets[i] <= j}) — searchsorted lowers poorly on TPU.
    offsets = jnp.concatenate([jnp.zeros(1, cov.dtype), jnp.cumsum(cov)[:-1]])
    total = offsets[-1] + cov[-1]
    j = jnp.arange(I, dtype=jnp.int32)
    seed = jnp.full((I,), -1, jnp.int32)
    marks = seed.at[offsets].max(jnp.arange(C, dtype=jnp.int32), mode="drop")
    gauss_i = jax.lax.cummax(marks)
    inst_valid = (j < total) & (gauss_i >= 0)
    gi_safe = jnp.clip(gauss_i, 0, C - 1)
    gauss_i = jnp.where(inst_valid, gi_safe, C).astype(jnp.int32)

    # Instance r of gaussian i covers tile (min_x + r%w, min_y + r//w).
    # One packed ROW gather (TPU gathers fetch contiguous rows efficiently;
    # four separate scalar gathers are ~4x slower).
    w_safe = jnp.maximum(w, 1)
    packed = jnp.stack([min_x, min_y, w_safe, offsets], axis=1)  # [C, 4]
    vals = packed[gi_safe]  # [I, 4]
    r_i = j - vals[:, 3]
    # f32 div instead of vector-int div/mod (no TPU hardware; see _expand_orig).
    q = jnp.floor(
        (r_i.astype(jnp.float32) + 0.5) / vals[:, 2].astype(jnp.float32)
    ).astype(jnp.int32)
    tx = vals[:, 0] + (r_i - q * vals[:, 2])
    ty = vals[:, 1] + q
    tile_id = jnp.where(inst_valid, ty * grid_w + tx, T).astype(jnp.int32)

    cap_overflow = (
        jnp.sum(cov_raw - cov)  # per-gaussian coverage cap
        + jnp.maximum(total - I, 0)  # global instance budget
    )
    return order, tile_id, gauss_i, cap_overflow, jnp.sum(cov_raw), offsets, cov


def _tile_cull_dist2(conics, opacities):
    """Per-Gaussian squared pixel distance beyond which alpha can NEVER reach
    the compositor's 1/255 skip floor (exact-semantics tile culling).

    The EWA exponent is a negative-semidefinite quadratic form in the pixel
    offset d: power(p) = -0.5 d^T Q d <= -0.5 * lam_min(Q) * |d|^2, so
    alpha(p) = opac * exp(power) < 1/255 whenever
    |d|^2 > 2 * ln(255 * opac) / lam_min. Instances whose whole 16x16 tile
    lies beyond that distance contribute EXACTLY zero in the kernels (the
    skip floor zeroes alpha < 1/255), so dropping them at binning time
    changes no image or gradient bit. The upstream CUDA rasterizer bins the
    full bounding-box rect (its getRect; consumed at
    /root/reference/gaussian_renderer/__init__.py:85-93) and pays the walk —
    this cull is a TPU-side algorithmic win, not a semantics change.

    A 1e-3 relative margin on the threshold absorbs f32 rounding between
    this bound and the kernel's own alpha evaluation."""
    a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
    lam_min = jnp.maximum(0.5 * ((a + c) - jnp.sqrt((a - c) ** 2 + 4.0 * b * b)), 0.0)
    thr_log = jnp.log(jnp.maximum(opacities, 1e-12) * (255.0 / (1.0 - 1e-3)))
    # lam_min == 0 (degenerate ellipse): bound is useless -> never cull.
    d2 = jnp.where(lam_min > 0.0, 2.0 * thr_log / jnp.maximum(lam_min, 1e-30), jnp.inf)
    # opacity already below the floor (include mask kills these anyway).
    return jnp.where(thr_log > 0.0, d2, -1.0).astype(jnp.float32)


def _expand_orig(means2d, depths, radii, include, grid_w, grid_h, R, I,
                 conics=None, opacities=None):
    """Instance expansion in ORIGINAL gaussian order (no depth pre-sort) for
    the stream path: returns (tile_id [I], gauss_i [I], depth_i [I],
    cap_overflow [], total_raw [], offsets [C], cov [C]). Sentinels: tile T,
    gaussian C, depth +inf. Depth ordering is applied later by the two-key
    (tile, depth) instance sort in ``bin_stream``.

    When ``conics``/``opacities`` are given, instances whose tile provably
    cannot reach the 1/255 alpha floor are culled (see _tile_cull_dist2) —
    numerics-exact, and at realistic scale it removes the bounding-box
    corner/tail tiles that dominate the compositor's row count.

    The per-instance rect lookup rides TWO flat int32 gathers plus one f32
    depth gather — (min_x, min_y, w) bit-packed into one word — instead of a
    packed [I, 4] row gather: XLA:TPU lowers narrow row gathers several times
    slower than flat ones (measured on-chip, BENCH_SCALE.md).
    """
    C = means2d.shape[0]
    T = grid_w * grid_h
    assert grid_w < 1024 and grid_h < 1024  # 10-bit rect fields

    min_x, min_y, max_x, max_y = compute_rects(means2d, radii, grid_w, grid_h)
    w = max_x - min_x  # [C] tiles covered horizontally
    cov_raw = w * (max_y - min_y)
    cov_raw = jnp.where(include, cov_raw, 0)
    cov = jnp.minimum(cov_raw, R)

    # Instance layout without materializing [C, R]: gaussian i owns the
    # contiguous instance range [offsets[i], offsets[i] + cov[i]). The
    # instance -> gaussian map is scatter-max + cummax (owner of slot j is
    # max{i : offsets[i] <= j}) — searchsorted lowers poorly on TPU.
    offsets = jnp.concatenate([jnp.zeros(1, cov.dtype), jnp.cumsum(cov)[:-1]])
    total = offsets[-1] + cov[-1]
    j = jnp.arange(I, dtype=jnp.int32)
    seed = jnp.full((I,), -1, jnp.int32)
    marks = seed.at[offsets].max(jnp.arange(C, dtype=jnp.int32), mode="drop")
    gauss_raw = jax.lax.cummax(marks)
    inst_valid = (j < total) & (gauss_raw >= 0)
    gi_safe = jnp.clip(gauss_raw, 0, C - 1)

    # Instance r of gaussian i covers tile (min_x + r%w, min_y + r//w).
    # The owner's rect/offset/depth arrive via ONE [C, 4] f32 ROW gather:
    # measured on-chip, three separate flat int32 gathers cost ~21 ns per
    # row where the packed row gather costs ~6 (the inverse of the scatter
    # tradeoff, where flat beats rows 9x). All four fields are exactly
    # representable in f32 (rect_xy < 2^20, w <= 1024, offsets < 2^24), and
    # the tile arithmetic runs in exact f32 — vector integer div/mod has no
    # TPU hardware, f32 division with a +0.5 dividend bias is exact here
    # (at r = k*w the bias keeps floor at k; at r = k*w - 1 it stays below).
    f32 = jnp.float32
    w_safe = jnp.maximum(w, 1)
    rect_xy = (min_x + min_y * 1024).astype(f32)
    cull = conics is not None
    cols = [rect_xy, w_safe.astype(f32), offsets.astype(f32), depths.astype(f32)]
    if cull:
        cols += [
            means2d[:, 0].astype(f32),
            means2d[:, 1].astype(f32),
            _tile_cull_dist2(conics, opacities),
            jnp.zeros((C,), f32),  # pad to 8 f32 = 32B rows
        ]
    packed = jnp.stack(cols, axis=1)  # [C, 4 or 8] f32
    vals = packed[gi_safe]  # [I, .] row gather
    rxy, w_g, dep_g = vals[:, 0], vals[:, 1], vals[:, 3]
    if I < (1 << 24):
        r_i = j.astype(f32) - vals[:, 2]
    else:
        # offsets/iota exceed exact-f32 range only on untuned probes of
        # multi-million-gaussian scenes; take the exact int path for the
        # difference (small values resume exact f32 math below).
        r_i = (j - offsets[gi_safe].astype(jnp.int32)).astype(f32)
    q = jnp.floor((r_i + 0.5) / w_g)
    rem = r_i - q * w_g
    min_y_g = jnp.floor((rxy + 0.5) * (1.0 / 1024.0))
    tx = (rxy - 1024.0 * min_y_g) + rem
    ty = min_y_g + q
    if cull:
        # Nearest pixel CENTER of tile (tx, ty) to the splat center (pixel
        # centers are the integer grid the kernels evaluate: tile-local
        # px, py in 0..15 plus the tile origin tx*16, ty*16).
        cx, cy, d2_cut = vals[:, 4], vals[:, 5], vals[:, 6]
        qx = jnp.clip(cx, tx * 16.0, tx * 16.0 + 15.0)
        qy = jnp.clip(cy, ty * 16.0, ty * 16.0 + 15.0)
        d2 = (cx - qx) ** 2 + (cy - qy) ** 2
        inst_valid = inst_valid & (d2 <= d2_cut)
    tile_id = jnp.where(
        inst_valid, (ty * grid_w + tx).astype(jnp.int32), T
    ).astype(jnp.int32)
    gauss_i = jnp.where(inst_valid, gi_safe, C).astype(jnp.int32)
    depth_i = jnp.where(inst_valid, dep_g, jnp.inf)

    cap_overflow = (
        jnp.sum(cov_raw - cov)  # per-gaussian coverage cap
        + jnp.maximum(total - I, 0)  # global instance budget
    )
    return tile_id, gauss_i, depth_i, cap_overflow, jnp.sum(cov_raw), offsets, cov


class StreamBinned(NamedTuple):
    """Padded-CSR instance stream for the stream compositor (stream.py).

    Each tile's depth-ordered instance run is padded to a multiple of the
    chunk size so every chunk-row block belongs to exactly one tile (the
    granularity is recoverable as I_pad // len(chunk_tile)); padding rows use
    the gaussian sentinel C (whose property row is all zeros -> alpha 0).

    v4 layout note: ``stream_gauss`` indexes the ORIGINAL (unsorted)
    per-Gaussian arrays and ``order`` is the identity. Depth ordering rides
    the (tile, depth) two-key instance sort instead of a global pre-sort, so
    the renderer no longer gathers 10 property columns through a depth
    permutation (and, critically, its backward no longer scatter-adds them).
    """

    order: jnp.ndarray  # [C] int32 — IDENTITY (kept for API stability)
    stream_gauss: jnp.ndarray  # [I_pad] int32 — original gaussian idx, C = pad
    chunk_tile: jnp.ndarray  # [I_pad // chunk] int32 — tile id per chunk, T = trash
    tile_counts: jnp.ndarray  # [T] int32 — TRUE (uncapped) instances per tile
    covered: jnp.ndarray  # [T] bool — tile has >= 1 chunk inside the budget
    overflow: jnp.ndarray  # [] int32 — instances dropped by any static cap
    n_instances: jnp.ndarray  # [] int32 — true (unpadded, uncapped) instance total
    n_padded: jnp.ndarray  # [] int32 — padded stream length actually needed
    # Gradient-pullback layout (stream.stream_gather): position of each
    # UNSORTED (gaussian-major) instance in the padded stream (I_pad =
    # dropped), and each Gaussian's [offset, offset+cov) range in that
    # unsorted instance domain. Together they turn the stream->gaussian grad
    # reduction into gather + cumsum + boundary-gather (no colliding
    # scatter-add, which TPU serializes).
    pos_unsorted: jnp.ndarray  # [I] int32
    gauss_offsets: jnp.ndarray  # [C] int32
    gauss_cov: jnp.ndarray  # [C] int32


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_w", "grid_h", "max_tiles_per_gaussian", "max_instances", "max_stream", "chunk"
    ),
)
def bin_stream(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    include: jnp.ndarray,
    conics: jnp.ndarray | None = None,
    opacities: jnp.ndarray | None = None,
    *,
    grid_w: int,
    grid_h: int,
    max_tiles_per_gaussian: int = 128,
    max_instances: int = 0,
    max_stream: int = 0,
    chunk: int = CHUNK,
) -> StreamBinned:
    """Bin into the padded-CSR stream layout (no per-tile K cap, no [T, K]
    table): tile runs live contiguously in one [I_pad] stream at chunk-aligned
    starts, front-to-back within each run.

    v4 pipeline (each choice measured on the chip, BENCH_SCALE.md):

      * instances expand in ORIGINAL gaussian order (no global depth
        pre-sort), then ONE stable two-key ``lax.sort`` by (tile id, depth)
        orders every tile run front-to-back — TPU sorts are nearly free
        (~2 ms at 2.7M instances) while the old depth argsort + 10 permuted
        property gathers (and their scatter-add VJPs in the backward) were
        tens of ms;
      * the layout math is SCANS over the sorted instances — run boundaries
        by neighbor compare, ranks/starts by cummax/cumsum segment
        broadcasting;
      * the stream is built by FLAT scalar scatters with unique indices
        (one per output column). The previous single [I, 2] row scatter
        into an [I_pad, 2] table cost 106 ms at 1M Gaussians — XLA:TPU
        lowers narrow row scatters ~9x worse than flat ones.

    Budgets: ``max_instances`` bounds the expansion/sort domain (true
    instances, 0 = 16*C); ``max_stream`` bounds the chunk-padded stream
    (0 = max_instances + chunk * tiles/2 estimate). Instances beyond either
    are dropped and counted in ``overflow`` (budget overflow drops by
    original index — size budgets so it stays 0; the per-gaussian rect cap
    still sheds raster-order tiles exactly like the pre-v4 layout).

    ``chunk``: stream layout granularity (rows per compositor chunk). Large
    scenes use bigger chunks so the kernel's scalar-prefetched chunk->tile map
    ([I_pad // chunk] int32, SMEM-resident) stays under the ~1MB SMEM budget.
    """
    C = means2d.shape[0]
    T = grid_w * grid_h
    I = max_instances if max_instances > 0 else max(8192, 16 * C)
    I_pad = max_stream if max_stream > 0 else I + (T // 2 + 256) * chunk
    I_pad = ((I_pad + chunk - 1) // chunk) * chunk
    G = I_pad // chunk

    tile_id, gauss_i, depth_i, cap_overflow, total_raw, offsets, cov = _expand_orig(
        means2d, depths, radii, include, grid_w, grid_h, max_tiles_per_gaussian, I,
        conics, opacities,
    )
    i_iota = jnp.arange(I, dtype=jnp.int32)
    # Stable (tile, depth) sort carrying (gaussian, unsorted-index) payloads;
    # the second payload is the sort permutation the gradient pullback inverts.
    sorted_tiles, _, sorted_gauss, sorted_u = jax.lax.sort(
        (tile_id, depth_i, gauss_i, i_iota), num_keys=2, is_stable=True
    )

    valid = sorted_tiles < T
    boundary = jnp.concatenate(
        [jnp.ones(1, bool), sorted_tiles[1:] != sorted_tiles[:-1]]
    )
    # Padded stream position in TWO scans (not the old four): every element
    # advances the stream by one row, plus each run's LAST element appends
    # the run's tail padding ((-run_len) % chunk rows) — so
    #   pos[k] = k + exclusive_cumsum(tail_pad)[k]
    # (tail_pad sits at run ends, i.e. strictly before the next run's
    # elements, and the exclusive form keeps an element's own tail out).
    run_start = jax.lax.cummax(jnp.where(boundary, i_iota, -1))
    is_last = jnp.concatenate([boundary[1:], jnp.ones(1, bool)])
    tail_pad = jnp.where(
        is_last & valid, jnp.mod(run_start - (i_iota + 1), chunk), 0
    )
    padsum = jnp.cumsum(tail_pad)
    n_padded = jnp.sum(valid.astype(jnp.int32)) + padsum[-1]
    padsum_excl = padsum - tail_pad

    # Flat unique-index scatters build the stream; dropped/invalid instances
    # land at distinct out-of-bounds slots (mode="drop" discards them).
    in_budget = valid & (i_iota + padsum_excl < I_pad)
    pos = jnp.where(in_budget, i_iota + padsum_excl, I_pad + i_iota)
    stream_gauss = (
        jnp.full((I_pad,), C, jnp.int32)
        .at[pos]
        .set(sorted_gauss, mode="drop", unique_indices=True)
    )
    # Chunk -> tile map: only the chunk-start instances seed it (every
    # chunk-start slot inside a run holds a real instance — runs pad only at
    # their tails); chunks past the last run keep the trash-tile init.
    is_cs = in_budget & (pos % chunk == 0)
    cpos = jnp.where(is_cs, pos // chunk, G + i_iota)
    chunk_tile = (
        jnp.full((G,), T, jnp.int32)
        .at[cpos]
        .set(sorted_tiles, mode="drop", unique_indices=True)
    )

    # Gradient-pullback permutation: where each UNSORTED instance landed in
    # the padded stream (I_pad = dropped). Permutation inversion rides a
    # SORT (key = sorted_u, payload = pos) — TPU sorts measure ~5x cheaper
    # than the equivalent [I] unique-index scatter.
    _, pos_unsorted = jax.lax.sort_key_val(
        sorted_u, jnp.where(in_budget, pos, I_pad).astype(jnp.int32)
    )

    # Per-tile diagnostics from the chunk domain (G-sized scatters are cheap).
    real_per_chunk = jnp.sum((stream_gauss < C).reshape(G, chunk), axis=1)
    counts = (
        jnp.zeros((T + 1,), jnp.int32).at[chunk_tile].add(real_per_chunk, mode="drop")[:T]
    )
    covered = jnp.zeros((T + 1,), bool).at[chunk_tile].set(True, mode="drop")[:T]

    overflow = cap_overflow + jnp.sum((valid & ~in_budget).astype(jnp.int32))
    return StreamBinned(
        order=jnp.arange(C, dtype=jnp.int32),
        stream_gauss=stream_gauss,
        chunk_tile=chunk_tile,
        tile_counts=counts,
        covered=covered,
        overflow=overflow,
        n_instances=total_raw,
        n_padded=n_padded,
        pos_unsorted=pos_unsorted,
        gauss_offsets=offsets.astype(jnp.int32),
        gauss_cov=cov.astype(jnp.int32),
    )
