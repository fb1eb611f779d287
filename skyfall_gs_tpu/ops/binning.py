"""Tile binning for the tiled rasterizer: duplicate -> sort -> range layout.

TPU re-design of the CUDA rasterizer's duplicateWithKeys/radix-sort stage.
There are no atomics on TPU, so instead of per-tile atomic counters we:

  1. compute each splat's tile rectangle and touched-tile count,
  2. expand to one entry per (splat, tile) pair under a static capacity —
     as a run-start scatter + cumsum, NOT ``jnp.repeat`` (repeat's lowering
     hides a 1-element-slice gather that costs ~7 ms at 800k entries on
     TPU; narrow-slice gathers are the single most expensive primitive in
     this whole stage, see the profiles in CLAUDE.md),
  3. sort entries by (tile_id, depth) with a single XLA sort (the sort
     itself is CHEAP — ~1.4 ms at 786k — the bookkeeping around it is what
     must stay lean).

Entries stay in sorted order — tile runs are NOT re-laid out to chunk
boundaries.  Both kernels read a tile's run by over-reading from the
previous chunk boundary and masking the prefix lanes (Mosaic DMA slices
must start at lane-aligned offsets).  The backward kernel writes
per-entry gradients straight back in the same packed entry order, at the
same chunk-aligned offsets it reads: the cotangent of the packed
attribute gather IS the gradient buffer, with no intermediate layout and
no pickup gather (a (cap)-sized wide gather costs ~6 ms at 786k entries
— any design that re-orders the gradient stream pays it).

The only hazard is the single boundary chunk two adjacent tiles share
(tile t's last chunk = tile t+1's first).  The TPU grid runs tiles
sequentially on one core, and masked lanes write exact zeros, so the
later tile resolves it by ACCUMULATING its first chunk onto the block
instead of overwriting (its prefix lanes add zero onto the earlier
tile's values; its own lanes add onto the zeros the earlier tile left).
``write_fresh[t]`` tells the kernel whether tile t's first chunk block
was already covered by an earlier tile (accumulate) or is untouched HBM
garbage (plain write).  Per-gaussian accumulation stays in XLA's
canonical transpose-of-gather scatter-add.  Everything here is integer
bookkeeping treated as constants by autodiff.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

TILE = 16  # pixels per tile side; 16x16 = 256 = one lane register of pixels
# (TILE=32 was tried: it halves duplicated entries but quadruples per-entry
# pixel work — total pixel*entry pairs double and the step slows ~8%.)


class BinnedTiles(NamedTuple):
    """Depth-sorted per-tile entry layout (+ gradient-buffer layout).

    ``gather_idx`` points into a source array padded with one trailing dummy
    row (index N): every slot outside a live tile run gathers the dummy row,
    so stray gradients scatter-add onto it and are dropped when the caller
    strips the padding — no masking passes needed.
    """

    gather_idx: jnp.ndarray    # (cap + chunk,) int32 gaussian index (N = dummy)
    tile_start: jnp.ndarray    # (num_tiles,) int32 run starts in sorted order
    tile_count: jnp.ndarray    # (num_tiles,) int32 live entries per tile
    num_entries: jnp.ndarray   # () int32 total duplicated entries (pre-drop)
    overflow: jnp.ndarray      # () int32 entries dropped due to capacity
    # Chunk-aligned per-tile read base for the kernels' over-read streams
    # (= chunk_floor(tile_start)):
    read_base: Optional[jnp.ndarray] = None   # (num_tiles,)
    # Training-only (align=True): 1 iff tile t's first chunk block is NOT
    # shared with an earlier tile's write coverage (plain write vs
    # accumulate in the backward kernel).
    write_fresh: Optional[jnp.ndarray] = None  # (num_tiles,) int32 0/1


def num_tiles(height: int, width: int) -> tuple[int, int]:
    return -(-height // TILE), -(-width // TILE)


def _tile_rects(mean2d, radius, tiles_y, tiles_x, radius_xy=None):
    """Per-splat touched-tile rectangle (CUDA getRect convention, tightened
    to the exact AABB of the cutoff ellipse when ``radius_xy`` is given)."""
    if radius_xy is None:
        rx = ry = radius.astype(jnp.float32)
    else:
        rx = radius_xy[:, 0].astype(jnp.float32)
        ry = radius_xy[:, 1].astype(jnp.float32)
    mx, my = mean2d[:, 0], mean2d[:, 1]
    x0 = jnp.clip(jnp.floor((mx - rx) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - ry) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + rx + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + ry + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    rect_w = x1 - x0
    rect_h = y1 - y0
    count = jnp.where(radius > 0, rect_w * rect_h, 0)
    return x0, y0, rect_w, count


def per_splat_entries(mean2d, radius, height: int, width: int,
                      radius_xy=None) -> jnp.ndarray:
    """(N,) duplicated-entry count each splat would produce (0 = culled)."""
    tiles_y, tiles_x = num_tiles(height, width)
    return _tile_rects(mean2d, radius, tiles_y, tiles_x, radius_xy)[3]


def count_entries(mean2d, radius, height: int, width: int,
                  radius_xy=None) -> jnp.ndarray:
    """Total duplicated (splat, tile) entries a view would produce — used by
    trainers to right-size the binning capacity."""
    return jnp.sum(per_splat_entries(mean2d, radius, height, width, radius_xy))


def capacity_for_entries(worst_entries: int) -> int:
    """Production capacity for a measured worst-view entry count.

    1.2x margin: counts are re-measured right after every densify (the only
    fast-growth event); between events they drift slowly with the params,
    and an undershoot is surfaced as an overflow warning and healed at the
    next re-measure.  64k buckets bound recompiles.  Dead capacity is pure
    cost — the backward's transpose scatter-add prices every padded entry
    (~13 ns/index) whether live or not — so the margin is deliberately
    tight.  Single source of truth for the Trainer AND bench.py (the bench
    must measure exactly the capacity production trains with).
    """
    bucket = 64 * 1024
    return max(-(-int(worst_entries * 1.2) // bucket) * bucket, bucket)


def bin_gaussians(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    height: int,
    width: int,
    cap: int,
    chunk: int = 256,
    align: bool = True,
    radius_xy=None,
) -> BinnedTiles:
    """Build the per-tile entry layout.

    Args:
        mean2d: (N, 2) pixel-space centers.
        depth: (N,) view-space z used as the sort key.
        radius: (N,) int32 screen radii; 0 = culled.
        cap: static capacity for duplicated entries (excess is dropped and
            counted in ``overflow``).
        chunk: the Pallas kernel's per-iteration gaussian chunk (gradient
            buffer alignment granularity).
        align: when True (training), also compute the chunk-aligned
            gradient-buffer layout (grad_start / grad_dest) the backward
            kernel writes into.  When False (inference), skip it.
    """
    n = mean2d.shape[0]
    tiles_y, tiles_x = num_tiles(height, width)
    t_total = tiles_y * tiles_x

    x0, y0, rect_w, count = _tile_rects(mean2d, radius, tiles_y, tiles_x,
                                        radius_xy)

    cum = jnp.cumsum(count) - count                      # exclusive prefix
    total = cum[-1] + count[-1] if n > 0 else jnp.int32(0)

    # Single packed (tile | quantized depth) int32 key: one 1-key sort with
    # one payload column is ~2x cheaper on TPU than a 2-key sort with two.
    # Depth is quantized to the bits left under the tile field; order among
    # splats closer than (depth range / 2^depth_bits) is arbitrary — the
    # same tie-class the CUDA rasterizer has at float-key resolution.
    tile_bits = max(int(t_total + 1).bit_length(), 1)
    depth_bits = 31 - tile_bits
    vis = radius > 0
    big = jnp.float32(3.4e38)
    dmin = jnp.min(jnp.where(vis, depth, big))
    dmax = jnp.max(jnp.where(vis, depth, -big))
    dscale = (2.0 ** depth_bits - 1.0) / jnp.maximum(dmax - dmin, 1e-12)
    # Clip in integer space: 2^bits - 1 is not exactly representable in f32
    # for bits > 24, and a float-space clip would round up and overflow the
    # depth field into the neighboring tile's bucket.
    dq_g = jnp.maximum((depth - dmin) * dscale, 0.0).astype(jnp.int32)
    dq_g = jnp.minimum(dq_g, (1 << depth_bits) - 1)

    # One entry per (gaussian, touched tile).  Expansion = scatter a marker
    # at every run start (cum is non-decreasing; zero-count splats stack
    # markers on the next start, and the inclusive cumsum then skips them in
    # one jump) and prefix-sum.  This is what jnp.repeat does under the
    # hood MINUS its narrow-slice segment gather (~7 ms at this size).
    entry = jnp.arange(cap, dtype=jnp.int32)
    live = entry < jnp.minimum(total, cap)
    marks = jnp.zeros(cap, jnp.int32).at[cum].add(
        1, indices_are_sorted=True, unique_indices=False)
    gidx = jnp.cumsum(marks) - 1                          # (cap,)
    # Per-gaussian quantities enter through one WIDE row gather (multi-
    # column slices; a 1-column gather of the same count is ~6x slower on
    # TPU), bit-packed into 2 columns: [cum << 7 | rect_w,
    # (tile0 << depth_bits) | dq].  Bounds (checked): cum <= cap < 2^24 and
    # rect_w <= tiles_x < 2^7 (the reference caps resolution at 1600px;
    # 2^7 tiles = 2048px); the base key lives in the same 31-bit domain as
    # the final key, and adding the rank offset shifted above depth_bits
    # never carries into it (dq < 2^depth_bits).
    if cap >= (1 << 24) or tiles_x >= (1 << 7):
        raise ValueError(
            f"binning packing limits exceeded: cap={cap} (< 2^24), "
            f"tiles_x={tiles_x} (< 128)")
    packed = jnp.stack(
        [(cum.astype(jnp.int32) << 7) | jnp.maximum(rect_w, 1),
         ((y0 * tiles_x + x0) << depth_bits) | dq_g], axis=1)
    e = packed[gidx]                                     # (cap, 2)
    rank = entry - (e[:, 0] >> 7)
    rw = e[:, 0] & 127
    key = jnp.where(
        live,
        e[:, 1] + (((rank // rw) * tiles_x + rank % rw) << depth_bits),
        t_total << depth_bits)

    # is_stable=False: ties within (tile, quantized depth) may land in any
    # order — the same tie class the CUDA rasterizer has at float-key
    # resolution — and a stable sort makes XLA carry an extra iota payload.
    key_s, gidx_s = jax.lax.sort((key, gidx), num_keys=1, is_stable=False)
    tile_s = (key_s >> depth_bits).astype(jnp.int32)

    # Per-tile ranges in the sorted order.
    tile_edges = jnp.searchsorted(tile_s, jnp.arange(t_total + 1, dtype=jnp.int32))
    tile_count = (tile_edges[1:] - tile_edges[:-1]).astype(jnp.int32)
    tile_start = tile_edges[:-1].astype(jnp.int32)
    overflow = jnp.maximum(total - cap, 0)
    # Dead entries (>= total) sort to the end under the sentinel key; route
    # them to the dummy row n so (a) their attribute rows are zeros and (b)
    # any gradient they carry scatter-adds onto the dropped dummy row.
    gather_idx = jnp.pad(jnp.where(live, gidx_s, n), (0, chunk),
                         constant_values=n)
    read_base = ((tile_start // chunk) * chunk).astype(jnp.int32)

    if not align:
        # Inference: the forward kernel over-reads each tile's run from the
        # chunk boundary below its start and masks the prefix lanes.
        return BinnedTiles(
            gather_idx=gather_idx,
            tile_start=tile_start,
            tile_count=tile_count,
            num_entries=total,
            overflow=overflow,
            read_base=read_base,
        )

    # Training: both kernels read the packed sorted stream (same over-read
    # masking as inference); the backward kernel writes gradient chunks
    # back at the same offsets.  Tile t's first chunk block is shared with
    # an earlier tile's coverage iff read_base[t] < running max of earlier
    # coverage ends — the kernel then accumulates instead of overwriting.
    off0 = tile_start - read_base
    nchunks = jnp.where(
        tile_count > 0, (off0 + tile_count + chunk - 1) // chunk, 0)
    cov_end = jnp.where(tile_count > 0, read_base + nchunks * chunk, 0)
    cov_prev = jnp.concatenate(
        [jnp.zeros(1, cov_end.dtype), jax.lax.cummax(cov_end)[:-1]])
    write_fresh = (read_base >= cov_prev).astype(jnp.int32)

    return BinnedTiles(
        gather_idx=gather_idx,
        tile_start=tile_start,
        tile_count=tile_count,
        num_entries=total,
        overflow=overflow,
        read_base=read_base,
        write_fresh=write_fresh,
    )
