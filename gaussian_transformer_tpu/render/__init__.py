"""Differentiable tile-based Gaussian-splat renderer (TPU-native).

``render(camera, scene, ...)`` reproduces the reference facade's contract
(``/root/reference/gaussian_renderer/__init__.py:18-100``): a dict with
``render`` [3,H,W], ``viewspace_points``, ``visibility_filter`` and ``radii``.

Differences by design (TPU-first, not a port):
  * Everything is a pure function of pytrees — jit/vmap/grad compose with it.
  * The CUDA ``screenspace_points.retain_grad`` trick becomes an explicit
    ``screenspace_offset`` argument: pass zeros [C,2] and differentiate w.r.t.
    it to harvest the screen-space mean gradients densification needs
    (reference ``scene/gaussian_model.py:405-407``).
  * Static shapes everywhere: capacity-padded Gaussians, padded tile lists.

Pipeline: project (project.py) -> depth sort + instance-sort tile binning
(tiles.py) -> front-to-back composite (pallas_composite.py on TPU,
composite.py as the pure-XLA fallback/golden model).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from gaussian_transformer_tpu.render.project import Projected, project_gaussians
from gaussian_transformer_tpu.render.tiles import TILE, Binned, bin_gaussians, num_tiles
from gaussian_transformer_tpu.render.composite import composite_image

__all__ = ["render", "render_naive", "RenderConfig", "TILE", "tune_config"]


def tune_config(cfg, probe, headroom: float = 0.0, floor: int = 8192):
    """Right-size the static instance budgets from a probe render's measured
    counts. The per-instance sort/scan work is LINEAR in the budgets, and the
    auto budgets are sized for worst-case fresh scenes — trained scenes with
    small splats run ~2x faster at measured budgets. Budgets land on a 32k
    grain so retunes rarely recompile.

    ``probe``: the dict returned by ``render`` (uses ``n_instances``, and for
    the stream path ``n_padded`` + ``n_tiles``); an int is accepted as a bare
    true-instance count for backward compatibility.

    The stream budget is additionally CAPPED at the exact worst-case padding
    bound ``max_instances + n_tiles * chunk`` (each covered tile wastes at
    most chunk-1 rows), iterated with the SMEM chunk rule to a fixed point.
    The probe renders at auto (worst-case) budgets, so its chunk — and hence
    its measured padding — can be far larger than the tuned config's: at 1M
    Gaussians the probe's chunk-256 padding, x1.5 headroom, used to yield a
    5.1M-row budget that itself forced chunk 128, where the bound gives a
    guaranteed-overflow-free 3.2M rows at chunk 64. At small scenes the
    measured-padding estimate is smaller than the bound and wins unchanged.

    ``headroom`` 0.0 = scale-adaptive: x1.5 up to 512k measured instances
    (densify growth between retunes is percentage-wise large on small
    scenes), x1.25 above (kernel + binning cost is linear in the budgets,
    dead headroom rows cost real milliseconds at millions of instances;
    late-training growth per densify round is a few percent, and a retune
    past the margin is just one recompile)."""
    grain = 32768

    def bucket(n, hr):
        want = max(floor, int(n * hr))
        return ((want + grain - 1) // grain) * grain

    if isinstance(probe, dict):
        n_true = int(probe["n_instances"])
        n_padded = int(probe.get("n_padded", 0))
        n_tiles = int(probe.get("n_tiles", 0))
    else:
        n_true, n_padded, n_tiles = int(probe), 0, 0
    hr = headroom if headroom > 0.0 else (1.5 if n_true <= 512 * 1024 else 1.25)
    cfg = cfg.replace(max_instances=bucket(n_true, hr))
    if n_padded:
        stream = bucket(n_padded, hr)
        if n_tiles:
            for _ in range(8):
                # Same policy _auto_chunk applies at render time (fixed
                # point: the stream bound and the chunk size co-determine
                # each other, hence the iteration).
                chunk = _auto_chunk(0, n_tiles, cfg.replace(max_stream=stream))
                bound = cfg.max_instances + n_tiles * chunk
                bound = ((bound + grain - 1) // grain) * grain
                if bound >= stream:
                    break
                stream = bound
        cfg = cfg.replace(max_stream=stream)
    return cfg


@struct.dataclass
class RenderConfig:
    """Rasterizer configuration (the reference's PipelineParams analog,
    ``arguments/__init__.py:64-69``, plus TPU blocking knobs)."""

    convert_SHs_python: bool = struct.field(pytree_node=False, default=False)
    compute_cov3D_python: bool = struct.field(pytree_node=False, default=False)
    debug: bool = struct.field(pytree_node=False, default=False)
    # Static per-tile list capacity. Front-to-back saturation means overflow
    # drops only the farthest (least-weighted) Gaussians.
    max_per_tile: int = struct.field(pytree_node=False, default=256)
    # Static cap on tiles covered per gaussian (instance-sort binning).
    # 1024 ~= a safety bound only: at the old default of 128 the bench
    # scene's fresh-scene giant splats lost 8.4% of instances and the capped
    # image measured 33.4 dB PSNR vs uncapped (tools/overflow_price.py) —
    # a visible delta, not a benign truncation. The v4 layout never
    # materializes [C, R], so the generous cap costs only the true extra
    # instances (+8% at the bench point, 0 on trained/densified scenes).
    max_tiles_per_gaussian: int = struct.field(pytree_node=False, default=1024)
    # Exact-semantics tile culling in the stream binning: drop (gaussian,
    # tile) instances whose alpha provably stays under the 1/255 skip floor
    # across the whole tile (tiles._tile_cull_dist2). Changes no image or
    # gradient bit at fp32; disable only for A/B.
    tile_cull: bool = struct.field(pytree_node=False, default=True)
    # Global (gaussian, tile) instance budget; 0 = auto (16 * capacity).
    max_instances: int = struct.field(pytree_node=False, default=0)
    # CHUNK-padded stream budget (stream compositor); 0 = auto estimate.
    max_stream: int = struct.field(pytree_node=False, default=0)
    tile_block: int = struct.field(pytree_node=False, default=64)
    # Stream layout granularity (rows per compositor chunk); 0 = auto (32,
    # doubled until the kernel's SMEM-resident chunk->tile map fits — large
    # scenes need bigger chunks, see _auto_chunk).
    chunk: int = struct.field(pytree_node=False, default=0)
    # Compositing backend: Pallas kernel (VMEM recurrence, custom VJP) or the
    # pure-XLA fallback (composite.py). Pallas interprets on CPU.
    use_pallas: bool = struct.field(pytree_node=False, default=True)
    # Pallas variant: padded-CSR instance stream (stream.py — no [T, K] table,
    # uncapped per-tile lists) vs the [T, K]-table kernel (pallas_composite.py).
    use_stream: bool = struct.field(pytree_node=False, default=True)
    # "bf16": stream the property rows as bf16 (tile-local means, fp32
    # accumulation) — halves the compositor's dominant HBM read at a
    # documented O(1e-2) alpha quantization delta (stream.py).
    precision: str = struct.field(pytree_node=False, default="fp32")
    # Property-block rows per stream-kernel program (amortizes grid
    # scheduling; 2*block_rows*16*4 B of VMEM per pipeline buffer). Tunable
    # for on-chip sweeps (tools/ab_bench.py).
    block_rows: int = struct.field(pytree_node=False, default=2048)
    # Stream-kernel memory layout. Only "rows" ([I_pad, 16]) remains: the
    # lane-native "transposed" ([16, I_pad]) kernel measured a 2.8x LOSS
    # on-chip (its lane-axis Hillis-Steele scans outweigh the avoided HBM
    # staging copy — BENCH_SCALE.md round-3 A/B) and is preserved for the
    # record at attic/stream_t.py.
    layout: str = struct.field(pytree_node=False, default="rows")


_MAX_CHUNKS = 65536  # chunk->tile map is scalar-prefetched: [G] int32 in SMEM
                     # (~1MB total); 64k entries = 256KB leaves ample headroom.
# Soft chunk-count target: the compositor kernels carry the transmittance
# recurrence chunk-by-chunk, so per-chunk fixed cost (scalar loads, branches,
# carry round-trips) scales with the chunk COUNT. The on-chip 1M sweep
# (tools/ab_bench.py, 2026-08-20) measured chunk=128 (~24k chunks) 10.6 ms
# faster per step than the SMEM-only policy's chunk=64 (~42k), while
# chunk=256 LOSES (tile-run tail padding grows ~T*chunk/2 rows and the
# bigger DMA blocks stop amortizing). Cap the escalation at 128 — larger
# chunks were only measured slower.
_TARGET_CHUNKS = 24576
_TARGET_CHUNK_CAP = 128


def _auto_chunk(n_capacity: int, n_tiles: int, cfg: "RenderConfig") -> int:
    """Smallest chunk size (>=32, power-of-two steps) whose chunk count fits
    the SMEM budget, then escalated (up to _TARGET_CHUNK_CAP) while the
    estimated chunk count still exceeds _TARGET_CHUNKS."""
    if cfg.chunk:
        return cfg.chunk
    I = cfg.max_instances if cfg.max_instances > 0 else max(8192, 16 * n_capacity)

    def n_chunks(chunk):
        i_pad = cfg.max_stream if cfg.max_stream > 0 else I + (n_tiles // 2 + 256) * chunk
        return (i_pad + chunk - 1) // chunk

    chunk = 32
    while chunk < 1024 and n_chunks(chunk) > _MAX_CHUNKS:
        chunk *= 2
    while chunk < _TARGET_CHUNK_CAP and n_chunks(chunk) > _TARGET_CHUNKS:
        chunk *= 2
    return chunk


def render(
    viewpoint_camera,
    pc,
    cfg: RenderConfig = RenderConfig(),
    bg_color: Optional[jnp.ndarray] = None,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    screenspace_offset: Optional[jnp.ndarray] = None,
):
    """Render a GaussianScene from a Camera/MiniCam.

    Returns the reference's 4-key dict (gaussian_renderer/__init__.py:97-100)
    plus ``final_T`` (remaining transmittance) and ``overflow`` diagnostics.
    """
    import math

    H, W = viewpoint_camera.image_height, viewpoint_camera.image_width
    tan_fovx = math.tan(viewpoint_camera.fovx * 0.5)
    tan_fovy = math.tan(viewpoint_camera.fovy * 0.5)
    bg = jnp.zeros(3, jnp.float32) if bg_color is None else jnp.asarray(bg_color)

    scales = pc.get_scaling
    rotations = pc.get_rotation
    opacities = pc.get_opacity[:, 0]
    shs = None if override_color is not None else pc.get_features

    proj = project_gaussians(
        pc.get_xyz,
        scales,
        rotations,
        opacities,
        shs,
        override_color,
        world_view_transform=viewpoint_camera.world_view_transform,
        full_proj_transform=viewpoint_camera.full_proj_transform,
        camera_center=viewpoint_camera.camera_center,
        image_width=W,
        image_height=H,
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
        active_sh_degree=pc.active_sh_degree,
        scaling_modifier=scaling_modifier,
    )

    means2d = proj.means2d
    if screenspace_offset is not None:
        means2d = means2d + screenspace_offset

    grid_w, grid_h = num_tiles(W), num_tiles(H)
    # Opacity below 1/255 can never pass the alpha skip; excluding it here keeps
    # dead capacity slots out of the tile lists entirely.
    include = (proj.radii > 0) & (proj.opacities >= 1.0 / 255.0)

    if cfg.use_pallas and cfg.use_stream:
        from gaussian_transformer_tpu.render.tiles import bin_stream
        from gaussian_transformer_tpu.render.stream import stream_image

        binned = bin_stream(
            means2d,
            proj.depths,
            proj.rect_bin,
            include,
            # Exact-semantics tile culling (tiles._tile_cull_dist2): drop
            # (gaussian, tile) instances that can never reach the 1/255
            # alpha floor anywhere in the tile.
            jax.lax.stop_gradient(proj.conics) if cfg.tile_cull else None,
            jax.lax.stop_gradient(proj.opacities) if cfg.tile_cull else None,
            grid_w=grid_w,
            grid_h=grid_h,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            max_instances=cfg.max_instances,
            max_stream=cfg.max_stream,
            chunk=_auto_chunk(means2d.shape[0], grid_w * grid_h, cfg),
        )
        # v4 stream layout: stream_gauss indexes the ORIGINAL arrays (depth
        # ordering rides the two-key instance sort), so no order gathers here
        # — and no scatter-add VJPs for them in the backward.
        if cfg.layout == "transposed":
            raise NotImplementedError(
                "the transposed stream kernel was a measured 2.8x loss and "
                "was retired to attic/stream_t.py (BENCH_SCALE.md round-3 A/B)"
            )
        else:
            img_pad, t_pad = stream_image(
                binned,
                means2d,
                proj.conics,
                proj.rgbs,
                proj.opacities,
                bg,
                grid_w=grid_w,
                grid_h=grid_h,
                precision=cfg.precision,
                block_rows=cfg.block_rows,
            )
        image = img_pad[:, :H, :W]
        return {
            "render": image,
            "viewspace_points": screenspace_offset,
            "visibility_filter": proj.radii > 0,
            "radii": proj.radii,
            "final_T": t_pad[:H, :W],
            "overflow": binned.overflow,
            "n_instances": binned.n_instances,
            "n_padded": binned.n_padded,
            "n_tiles": grid_w * grid_h,
        }

    binned = bin_gaussians(
        means2d,
        proj.depths,
        proj.radii,
        include,
        grid_w=grid_w,
        grid_h=grid_h,
        max_per_tile=cfg.max_per_tile,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        max_instances=cfg.max_instances,
    )

    order = binned.order
    if cfg.use_pallas:
        from gaussian_transformer_tpu.render.pallas_composite import composite_image_pallas

        img_pad, t_pad = composite_image_pallas(
            binned,
            means2d[order],
            proj.conics[order],
            proj.rgbs[order],
            proj.opacities[order],
            bg,
            grid_w=grid_w,
            grid_h=grid_h,
        )
    else:
        img_pad, t_pad = composite_image(
            binned.tile_lists,
            means2d[order],
            proj.conics[order],
            proj.rgbs[order],
            proj.opacities[order],
            bg,
            grid_w=grid_w,
            grid_h=grid_h,
            tile_block=cfg.tile_block,
        )
    image = img_pad[:, :H, :W]
    final_T = t_pad[:H, :W]

    return {
        "render": image,
        "viewspace_points": screenspace_offset,
        "visibility_filter": proj.radii > 0,
        "radii": proj.radii,
        "final_T": final_T,
        "overflow": binned.overflow,
        "n_instances": binned.n_instances,
    }


def render_naive(
    viewpoint_camera,
    pc,
    bg_color: Optional[jnp.ndarray] = None,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
):
    """Brute-force golden renderer: every pixel composites over ALL Gaussians
    (depth-sorted, same skip/termination semantics, no tiling, no list cap).
    O(C·H·W) memory — for tests and tiny scenes only."""
    import math

    H, W = viewpoint_camera.image_height, viewpoint_camera.image_width
    tan_fovx = math.tan(viewpoint_camera.fovx * 0.5)
    tan_fovy = math.tan(viewpoint_camera.fovy * 0.5)
    bg = jnp.zeros(3, jnp.float32) if bg_color is None else jnp.asarray(bg_color)

    shs = None if override_color is not None else pc.get_features
    proj = project_gaussians(
        pc.get_xyz,
        pc.get_scaling,
        pc.get_rotation,
        pc.get_opacity[:, 0],
        shs,
        override_color,
        world_view_transform=viewpoint_camera.world_view_transform,
        full_proj_transform=viewpoint_camera.full_proj_transform,
        camera_center=viewpoint_camera.camera_center,
        image_width=W,
        image_height=H,
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
        active_sh_degree=pc.active_sh_degree,
        scaling_modifier=scaling_modifier,
    )

    include = (proj.radii > 0) & (proj.opacities >= 1.0 / 255.0)
    order = jnp.argsort(jnp.where(include, proj.depths, jnp.inf))
    xy = proj.means2d[order]
    con = proj.conics[order]
    rgb = proj.rgbs[order]
    op = jnp.where(include, proj.opacities, 0.0)[order]

    ys = jnp.arange(H, dtype=xy.dtype)
    xs = jnp.arange(W, dtype=xy.dtype)
    px, py = jnp.meshgrid(xs, ys)  # [H, W]

    dx = xy[:, 0, None, None] - px[None]  # [C, H, W]
    dy = xy[:, 1, None, None] - py[None]
    power = (
        -0.5 * (con[:, 0, None, None] * dx * dx + con[:, 2, None, None] * dy * dy)
        - con[:, 1, None, None] * dx * dy
    )
    alpha = jnp.minimum(0.99, op[:, None, None] * jnp.exp(jnp.minimum(power, 0.0)))
    # Match the tiled path's (and CUDA's) coverage: a Gaussian only touches the
    # tiles overlapping its radius rect, even if its tail is still >1/255 outside.
    from gaussian_transformer_tpu.render.tiles import compute_rects, num_tiles as _nt

    min_x, min_y, max_x, max_y = compute_rects(xy, proj.radii[order], _nt(W), _nt(H))
    ptx = (px // TILE).astype(jnp.int32)[None]  # [1, H, W]
    pty = (py // TILE).astype(jnp.int32)[None]
    in_rect = (
        (min_x[:, None, None] <= ptx)
        & (ptx < max_x[:, None, None])
        & (min_y[:, None, None] <= pty)
        & (pty < max_y[:, None, None])
    )
    skip = (power > 0.0) | (alpha < 1.0 / 255.0) | (~in_rect)
    alpha = jnp.where(skip, 0.0, alpha)

    one_minus = 1.0 - alpha
    cp = jnp.cumprod(one_minus, axis=0)
    T = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
    trigger = (~skip) & (T * one_minus < 1e-4)
    done = jnp.cumsum(trigger.astype(jnp.int32), axis=0) > 0
    live = (~done).astype(alpha.dtype)

    weight = alpha * T * live
    image = jnp.einsum("chw,cx->xhw", weight, rgb, precision=jax.lax.Precision.HIGHEST)
    final_T = jnp.prod(1.0 - alpha * live, axis=0)
    image = image + final_T[None] * bg[:, None, None]
    return {"render": image, "radii": proj.radii, "final_T": final_T}
