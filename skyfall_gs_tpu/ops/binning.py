"""Tile binning for the tiled rasterizer: duplicate -> sort -> range layout.

TPU re-design of the CUDA rasterizer's duplicateWithKeys/radix-sort stage.
There are no atomics on TPU, so instead of per-tile atomic counters we:

  1. compute each splat's tile rectangle and touched-tile count,
  2. expand to one entry per (splat, tile) pair with ``jnp.repeat`` under a
     static capacity,
  3. sort entries by (tile_id, depth) with a single XLA sort,
  4. re-lay entries out so every tile's run starts at a chunk-aligned offset
     (``chunk`` = the Pallas kernel's gaussian-chunk size).  Aligned runs let
     the backward kernel write gradient chunks with plain contiguous DMAs —
     no read-modify-write and no cross-tile overlap.

Everything here is integer bookkeeping: the results are treated as constants
by autodiff (indices), and per-entry attribute gathers happen outside, where
XLA's gather/scatter-add transpose provides the gradient routing for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16  # pixels per tile side; 16x16 = 256 = one lane register of pixels


class BinnedTiles(NamedTuple):
    """Chunk-aligned, depth-sorted per-tile entry layout.

    ``gather_idx`` points into a source array padded with one trailing dummy
    row (index N): every slot outside a live tile run gathers the dummy row,
    so stray gradients scatter-add onto it and are dropped when the caller
    strips the padding — no masking passes needed.
    """

    gather_idx: jnp.ndarray    # (cap_pad,) int32 gaussian index per entry (N = dummy)
    tile_start: jnp.ndarray    # (num_tiles,) int32 aligned start offsets
    tile_count: jnp.ndarray    # (num_tiles,) int32 live entries per tile
    num_entries: jnp.ndarray   # () int32 total duplicated entries (pre-drop)
    overflow: jnp.ndarray      # () int32 entries dropped due to capacity


def num_tiles(height: int, width: int) -> tuple[int, int]:
    return -(-height // TILE), -(-width // TILE)


def _tile_rects(mean2d, radius, tiles_y, tiles_x):
    """Per-splat touched-tile rectangle (CUDA getRect convention)."""
    r = radius.astype(jnp.float32)
    mx, my = mean2d[:, 0], mean2d[:, 1]
    x0 = jnp.clip(jnp.floor((mx - r) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    rect_w = x1 - x0
    rect_h = y1 - y0
    count = jnp.where(radius > 0, rect_w * rect_h, 0)
    return x0, y0, rect_w, count


def count_entries(mean2d, radius, height: int, width: int) -> jnp.ndarray:
    """Total duplicated (splat, tile) entries a view would produce — used by
    trainers to right-size the binning capacity."""
    tiles_y, tiles_x = num_tiles(height, width)
    return jnp.sum(_tile_rects(mean2d, radius, tiles_y, tiles_x)[3])


def bin_gaussians(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    height: int,
    width: int,
    cap: int,
    chunk: int = 256,
    align: bool = True,
) -> BinnedTiles:
    """Build the (optionally chunk-aligned) per-tile entry layout.

    Args:
        mean2d: (N, 2) pixel-space centers.
        depth: (N,) view-space z used as the sort key.
        radius: (N,) int32 screen radii; 0 = culled.
        cap: static capacity for duplicated entries (excess is dropped and
            counted in ``overflow``).
        chunk: alignment granularity — must equal the Pallas kernel's
            per-iteration gaussian chunk.
        align: when True (training), re-lay entries out so each tile's run
            starts at a chunk boundary (required by the backward kernel's
            contiguous gradient writes).  When False (inference), skip the
            scatter and padding entirely — the forward kernel handles
            unaligned run starts by over-reading from the previous chunk
            boundary and masking.
    """
    n = mean2d.shape[0]
    tiles_y, tiles_x = num_tiles(height, width)
    t_total = tiles_y * tiles_x
    # Worst-case alignment padding (aligned) / one chunk of over-read slack
    # at the buffer end (unaligned).
    cap_pad = cap + (t_total * chunk if align else chunk)

    x0, y0, rect_w, count = _tile_rects(mean2d, radius, tiles_y, tiles_x)

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

    # One entry per (gaussian, touched tile); all per-gaussian quantities are
    # packed so the expansion is a single 4-column row gather.
    gidx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), count,
                      total_repeat_length=cap)
    packed = jnp.stack(
        [cum.astype(jnp.int32), rect_w, y0 * tiles_x + x0, dq_g], axis=1)
    e = packed[gidx]                                     # (cap, 4)
    entry = jnp.arange(cap, dtype=jnp.int32)
    live = entry < jnp.minimum(total, cap)
    rank = entry - e[:, 0]
    rw = jnp.maximum(e[:, 1], 1)
    tile = e[:, 2] + (rank // rw) * tiles_x + rank % rw
    key = jnp.where(live, (tile << depth_bits) | e[:, 3],
                    t_total << depth_bits)

    key_s, gidx_s = jax.lax.sort((key, gidx), num_keys=1)
    tile_s = (key_s >> depth_bits).astype(jnp.int32)

    # Per-tile ranges in the sorted order.
    tile_edges = jnp.searchsorted(tile_s, jnp.arange(t_total + 1, dtype=jnp.int32))
    tile_count = (tile_edges[1:] - tile_edges[:-1]).astype(jnp.int32)
    overflow = jnp.maximum(total - cap, 0)

    if not align:
        gather_idx = jnp.pad(gidx_s, (0, chunk), constant_values=n)
        return BinnedTiles(
            gather_idx=gather_idx,
            tile_start=tile_edges[:-1].astype(jnp.int32),
            tile_count=tile_count,
            num_entries=total,
            overflow=overflow,
        )

    # Chunk-aligned re-layout: tile t's run starts at padded_start[t].
    padded_sizes = -(-tile_count // chunk) * chunk
    padded_start = (jnp.cumsum(padded_sizes) - padded_sizes).astype(jnp.int32)

    # The sorted key already carries each entry's tile — no per-entry search.
    # dest is strictly increasing (live entries: tile ascending, rank
    # ascending, all < cap_pad; dropped entries sort to the tail and get
    # distinct out-of-bounds slots >= cap_pad); telling XLA the indices are
    # sorted and unique switches the scatter to its fast path — worth ~7ms
    # at 500k entries vs. the unhinted lowering.
    entry_pos = jnp.arange(cap, dtype=jnp.int32)
    in_real_tile = tile_s < t_total
    tile_c = jnp.minimum(tile_s, t_total - 1)
    rank_in_tile = entry_pos - tile_edges[tile_c]
    dest = jnp.where(
        in_real_tile,
        padded_start[tile_c] + rank_in_tile,
        cap_pad + entry_pos,  # unique OOB slots, dropped by scatter
    )
    gather_idx = jnp.full((cap_pad,), n, jnp.int32).at[dest].set(
        gidx_s, mode="drop", indices_are_sorted=True, unique_indices=True
    )

    return BinnedTiles(
        gather_idx=gather_idx,
        tile_start=padded_start,
        tile_count=tile_count,
        num_entries=total,
        overflow=overflow,
    )
