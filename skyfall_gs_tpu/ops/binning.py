"""Tile binning for the tiled rasterizer: duplicate -> sort -> range layout.

TPU re-design of the CUDA rasterizer's duplicateWithKeys/radix-sort stage.
There are no atomics on TPU, so instead of per-tile atomic counters we:

  1. compute each splat's tile rectangle and touched-tile count,
  2. expand to one entry per (splat, tile) pair with ``jnp.repeat`` under a
     static capacity,
  3. sort entries by (tile_id, depth) with a single XLA sort.

Entries stay in sorted order — tile runs are NOT re-laid out to chunk
boundaries.  Both kernels read a tile's run by over-reading from the
previous chunk boundary and masking (Mosaic DMA slices must start at
lane-aligned offsets).  The backward kernel still needs somewhere
collision-free to WRITE per-entry gradients, so the training layout
additionally computes a chunk-aligned *gradient buffer* layout:

  * ``grad_start[t]``: exclusive chunk-aligned region per tile, sized
    ceil((start % chunk + count) / chunk) * chunk — exactly the chunks the
    backward kernel's over-read stream covers;
  * ``grad_gidx[k]``: the gaussian owning gradient-buffer slot k — a pure
    elementwise/cumsum computation (no scatter; the round-1 re-layout
    scatter cost ~7 ms/step at 500k entries and is gone).

The training attribute gather uses ``grad_gidx`` directly, so the forward
read layout and the backward gradient buffer coincide and the per-gaussian
gradient accumulation stays in XLA's canonical transpose-of-gather
scatter-add.  Everything here is integer bookkeeping treated as constants
by autodiff.
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
    # Training-only (align=True) gradient-buffer layout:
    grad_start: Optional[jnp.ndarray] = None  # (num_tiles,) chunk-aligned
    grad_gidx: Optional[jnp.ndarray] = None   # (grad_cap,) slot -> gaussian
    # Chunk-aligned per-tile read offsets for the kernels (= grad_start when
    # aligned, chunk_floor(tile_start) when not):
    read_base: Optional[jnp.ndarray] = None   # (num_tiles,)


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


def count_entries(mean2d, radius, height: int, width: int,
                  radius_xy=None) -> jnp.ndarray:
    """Total duplicated (splat, tile) entries a view would produce — used by
    trainers to right-size the binning capacity."""
    tiles_y, tiles_x = num_tiles(height, width)
    return jnp.sum(_tile_rects(mean2d, radius, tiles_y, tiles_x, radius_xy)[3])


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
    tile_start = tile_edges[:-1].astype(jnp.int32)
    overflow = jnp.maximum(total - cap, 0)
    gather_idx = jnp.pad(gidx_s, (0, chunk), constant_values=n)

    if not align:
        # Inference layout: entries stay packed in sorted order; the kernel
        # over-reads each tile's run from the chunk boundary below its start
        # and masks the prefix lanes.
        return BinnedTiles(
            gather_idx=gather_idx,
            tile_start=tile_start,
            tile_count=tile_count,
            num_entries=total,
            overflow=overflow,
            read_base=((tile_start // chunk) * chunk).astype(jnp.int32),
        )

    # Training layout: materialize each tile's run at a chunk-aligned,
    # chunk-padded exclusive region — slot k of tile t's region carries the
    # gaussian of sorted entry tile_start[t] + (k - region_start); lanes
    # past the run are masked by the kernels.  The payoff: the backward
    # kernel writes its per-entry gradients at the SAME slots it read, so
    # the cotangent of the gathered attributes is the raw gradient buffer —
    # no pickup gather, no re-layout scatter, and the per-gaussian
    # accumulation stays in XLA's canonical transpose-of-gather scatter-add
    # form (hand-separated gather+scatter cost +16..+45 ms/step).  The
    # whole layout is elementwise math from the sort — the round-1
    # re-layout scatter (~7 ms/step) is gone.
    padded = ((tile_count + chunk - 1) // chunk) * chunk
    grad_start = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    grad_cap = cap + t_total * chunk  # worst case: per-tile chunk rounding

    slot = jnp.arange(grad_cap, dtype=jnp.int32)
    # entry(slot) = slot - (grad_start[t] - tile_start[t]) for the region
    # owning the slot.  The per-slot shift is a step function: scatter each
    # region's delta at its start and prefix-sum — a per-slot searchsorted
    # lowers to a bit-scan loop that costs ~50 ms at 662k queries on TPU.
    # Zero-size regions collapse correctly (their deltas land on the same
    # slot and the cumsum keeps the later tile's shift).
    shift = grad_start - tile_start
    deltas = jnp.concatenate([shift[:1], jnp.diff(shift)])
    shift_of = jnp.cumsum(
        jnp.zeros(grad_cap, jnp.int32).at[grad_start].add(deltas))
    entry = slot - shift_of
    # Slots past the last tile's region are never written by the backward
    # kernel (uninitialized) — route them to the dummy row n, which the
    # caller strips (regression: garbage/NaN would otherwise land on real
    # gaussians).
    used = slot < grad_start[-1] + padded[-1]
    grad_gidx = jnp.where(
        used, gather_idx[jnp.clip(entry, 0, cap + chunk - 1)], n)

    return BinnedTiles(
        gather_idx=gather_idx,
        tile_start=tile_start,
        tile_count=tile_count,
        num_entries=total,
        overflow=overflow,
        grad_start=grad_start,
        grad_gidx=grad_gidx,
        read_base=grad_start,
    )
