"""Tiled Pallas rasterizer: the production TPU compositing backend.

Replaces the reference's CUDA tile rasterizer (`diff-gaussian-rasterization-
depth`) forward/backward.  Design (TPU-first, not a CUDA translation):

  * Binning/sorting happens in XLA (ops/binning.py) — sorts and scatters are
    compiler territory on TPU, not kernel territory.
  * The Pallas kernel grid iterates over 16x16 pixel tiles.  Within a tile it
    streams depth-sorted gaussian entries from HBM in chunks of ``CHUNK``
    with double-buffered async DMA.  Attributes live transposed as
    ``(16, cap_pad)`` so a chunk DMA slices the lane dimension at
    256-aligned offsets (the Mosaic DMA alignment rule).
  * Per chunk: pixels on sublanes (the tile's 256 pixels as a (256, 1)
    column), gaussians on lanes ((1, CHUNK) attribute rows) -> (256, CHUNK)
    alpha matrices on the VPU; the front-to-back blend's prefix
    product runs as exp(cumsum(log)) with the cumsum on the MXU
    (one triangular matmul instead of a 7-pass VPU lane scan); channel accumulation is one MXU matmul per
    chunk ((8, CHUNK) x (256, CHUNK)^T -> (8, 256)).
  * Early termination: the tile loop stops once every pixel's transmittance
    falls below 1e-4 (the CUDA rule, applied per chunk).
  * The backward kernel streams the same data, recomputes forward state, and
    uses the suffix-color trick (Q = running prefix sum of w * (c . dC)) to
    form d(alpha) without storing per-entry state; per-entry gradients are
    lane-parallel sublane reductions plus two MXU matmuls.  It additionally
    emits AbsGS absolute screen-space gradients (reference
    scene/gaussian_model.py:744-749) as two extra gradient rows.
  * Entries stay in the sorted order (no re-layout scatter): both kernels
    over-read each tile's run from the previous chunk boundary and mask
    the prefix lanes.  The backward kernel writes gradient chunks back at
    the SAME offsets, so its output is directly the cotangent of the
    packed attribute gather — no gradient relayout, no pickup gather.
    The one block two adjacent tiles share (last chunk of t = first chunk
    of t+1) is resolved by ACCUMULATION: the grid is sequential on the
    core, masked lanes carry exact zeros, and the later tile adds its
    chunk onto the earlier tile's block (binning.write_fresh flags blocks
    with no earlier coverage, which are plain-written).  No atomics
    needed.

The custom-VJP boundary wraps only (sorted attributes -> tile images); the
projection before it and the gather into sorted order are plain JAX, so XLA
autodiff routes gradients to the 3D parameters (including duplicate-entry
accumulation through the gather transpose) automatically.

Attribute row layout (16, cap_pad) — Mosaic requires sublane extents in
multiples of 8, and 15 content rows pack exactly into 16 (an earlier
18-row layout rounded up to 24, paying +50% DMA/gather bytes for pad):
  rows 0..6   blend channels (r, g, b, depth, nx, ny, nz)
  row  7      zero pad (keeps the channel block at the MXU-friendly 8)
  rows 8..13  mx, my, conic_a, conic_b, conic_c, opacity
  rows 14,15  AbsGS dummy (zeros in; backward emits |dmx|, |dmy| here)

The AbsGS rows ride in the SAME table as the real attributes so the whole
backward needs exactly ONE gather and ONE transpose scatter-add: profiled
on TPU, a scatter-add's cost is per-index (~13 ns/index), not per-byte —
a separate 2-row scatter for the AbsGS grads costs the same ~10 ms as the
16-row one, so merging them halves the dominant cost of the whole step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skyfall_gs_tpu.ops.binning import TILE, bin_gaussians, num_tiles
from skyfall_gs_tpu.ops.rasterize_ref import ALPHA_EPS, ALPHA_MAX, T_EPS

P = TILE * TILE      # pixels per tile = 256
NA = 16              # attribute rows per entry (8 channel + 6 geom + 2 AbsGS)
CHUNK = 128          # gaussian entries per prefix-scan sub-chunk
# (CHUNK=256 for the SCAN doubles per-entry MXU prefix work: +18 ms/step;
#  64 violates the 128-lane DMA slice alignment.)
BLOCK = 2 * CHUNK    # gaussian entries per DMA / loop iteration: two
# 128-lane sub-chunks run unrolled inside one iteration, halving the
# per-iteration loop + DMA-bookkeeping overhead (~0.6 us/iteration) while
# keeping the prefix scans at the MXU-optimal 128 width.
NCH = 8              # channel rows (7 used + 1 pad)


class _Config(NamedTuple):
    tiles_y: int
    tiles_x: int
    cap_pad: int
    interpret: bool
    grad_cap: int = 0  # gradient-buffer size (= cap_pad; 0 = inference)


def _interpret_default() -> bool:
    import os

    flag = os.environ.get("SKYFALL_INTERPRET")
    if flag is not None:
        return flag not in ("0", "false", "False")
    return jax.default_backend() == "cpu"


def _tri_incl() -> jnp.ndarray:
    """(CHUNK, CHUNK) upper-triangular ones: X @ TRI = inclusive lane cumsum.

    One MXU matmul replaces the log2(CHUNK)=7 roll/where/op VPU passes of a
    log-step scan — the scans were the kernels' VPU hotspot.
    """
    k = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (k <= g).astype(jnp.float32)


def _cumsum_incl(x, tri):
    return jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _cumprod_incl(x, tri):
    """Inclusive lane cumprod of x in (0, 1]: exp(cumsum(log x)) on the MXU.

    Safe here: x = 1 - alpha with alpha <= ALPHA_MAX = 0.99, so x >= 0.01
    and log is well-conditioned; masked lanes are exactly 1 (log 0).
    """
    return jnp.exp(_cumsum_incl(jnp.log(x), tri))


def _excl_from_incl_prod(incl: jnp.ndarray) -> jnp.ndarray:
    cols = jax.lax.broadcasted_iota(jnp.int32, incl.shape, 1)
    shifted = pltpu.roll(incl, 1, 1)
    return jnp.where(cols >= 1, shifted, 1.0)


def _pixel_coords(t, tiles_x, offx_ref, offy_ref):
    """Pixel centers for tile ``t`` as (P, 1) columns."""
    ty = t // tiles_x
    tx = t % tiles_x
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * TILE + pix % TILE).astype(jnp.float32) + offx_ref[...]
    py = (ty * TILE + pix // TILE).astype(jnp.float32) + offy_ref[...]
    return px, py


def _chunk_state(buf, px, py, base, lo, hi):
    """Forward per-chunk state shared by both kernels.

    An entry at lane l of chunk c has run-relative index base + l (base =
    c * CHUNK - over-read offset); it is live when lo <= idx < hi.  Aligned
    layouts use lo = 0.
    """
    mx = buf[8:9, :]
    my = buf[9:10, :]
    ca = buf[10:11, :]
    cb = buf[11:12, :]
    cc = buf[12:13, :]
    op = buf[13:14, :]
    dx = px - mx                       # (P, G)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    expp = jnp.exp(power)
    alpha_un = op * expp
    alpha_cl = jnp.minimum(alpha_un, ALPHA_MAX)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + base
    use = (lidx >= lo) & (lidx < hi) & (power <= 0.0) & (alpha_cl >= ALPHA_EPS)
    alpha = jnp.where(use, alpha_cl, 0.0)
    return alpha, alpha_un, expp, use, dx, dy, ca, cb, cc


def _make_read_dma(attrs_ref, buf_ref, sem_ref, start):
    def dma(slot, c):
        off = pl.multiple_of(start + c * BLOCK, BLOCK)
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(off, BLOCK)],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )
    return dma


# ----------------------------------------------------------------------------
# Forward kernel
# ----------------------------------------------------------------------------

def _fwd_kernel(tiles_x: int, start_ref, count_ref,
                attrs_ref, offx_ref, offy_ref, out_ref, tfin_ref, buf, sems):
    t = pl.program_id(0)
    start = start_ref[t]
    cnt = count_ref[t]
    # Runs share the packed sorted buffer: over-read from the block
    # boundary below the run start and mask the prefix lanes.  Empty tiles
    # do zero blocks (their off0 alone would otherwise round up to one).
    base = (start // BLOCK) * BLOCK
    off0 = start - base
    nblocks = jnp.where(cnt > 0, (off0 + cnt + BLOCK - 1) // BLOCK, 0)
    px, py = _pixel_coords(t, tiles_x, offx_ref, offy_ref)
    tri = _tri_incl()
    dma = _make_read_dma(attrs_ref, buf, sems, base)

    @pl.when(nblocks > 0)
    def _():
        dma(0, 0).start()

    def cond(carry):
        c, t_run, _, _ = carry
        return (c < nblocks) & (jnp.max(t_run) >= T_EPS)

    def sub_step(chunk, sub_base, t_run, t_fin, acc):
        # t_run is the TRUE cumulative product over every entry so far
        # (skipped ones included) — the oracle's prefix property, so
        # ``keep`` matches rasterize_ref bit-for-bit and the while cond
        # genuinely fires once the whole tile saturates.  t_fin is the
        # FROZEN transmittance (T after the last contributing entry, the
        # CUDA done-flag value) — output only.  An earlier version carried
        # the frozen value alone: keep could then flip back on after a
        # chunk boundary (up to ~1e-2 of resumed weight under the
        # ALPHA_MAX clamp) and the loop never exited early (regression:
        # termination-resume test in tests/test_rasterizer.py).
        alpha, _, _, _, _, _, _, _, _ = _chunk_state(
            chunk, px, py, sub_base, off0, off0 + cnt)
        one_minus = 1.0 - alpha
        cum = _cumprod_incl(one_minus, tri)                  # (P, G)
        t_after = t_run * cum                                # t_run (P, 1)
        keep = t_after >= T_EPS
        t_before = t_run * _excl_from_incl_prod(cum)
        w = jnp.where(keep, alpha * t_before, 0.0)           # (P, G)
        col = chunk[0:NCH, :]                                # (8, G)
        acc = acc + jax.lax.dot_general(
            col, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                     # (8, P)
        t_fin = jnp.min(jnp.where(keep, t_after, t_fin), axis=1, keepdims=True)
        t_run = t_after[:, CHUNK - 1:CHUNK]
        return t_run, t_fin, acc

    def body(carry):
        c, t_run, t_fin, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nblocks)
        def _():
            dma(jax.lax.rem(c + 1, 2), c + 1).start()

        dma(slot, c).wait()
        block = buf[slot]                                    # (NA, BLOCK)
        for h in range(BLOCK // CHUNK):
            t_run, t_fin, acc = sub_step(
                block[:, h * CHUNK:(h + 1) * CHUNK],
                c * BLOCK + h * CHUNK, t_run, t_fin, acc)
        return c + 1, t_run, t_fin, acc

    init = (jnp.int32(0), jnp.ones((P, 1), jnp.float32),
            jnp.ones((P, 1), jnp.float32), jnp.zeros((NCH, P), jnp.float32))
    c_fin, _, t_fin, acc = jax.lax.while_loop(cond, body, init)

    # Drain a prefetch left in flight by an early exit.
    @pl.when(c_fin < nblocks)
    def _():
        dma(jax.lax.rem(c_fin, 2), c_fin).wait()

    out_ref[0] = acc
    tfin_ref[...] = t_fin


# ----------------------------------------------------------------------------
# Backward kernel
# ----------------------------------------------------------------------------

def _bwd_kernel(tiles_x: int, start_ref, count_ref, fresh_ref, attrs_ref,
                offx_ref, offy_ref, outres_ref, tfin_ref, dout_ref, dtfin_ref,
                dattrs_ref, buf, dbuf, rbuf, rsems, wsems, bsem):
    t = pl.program_id(0)
    start = start_ref[t]
    cnt = count_ref[t]
    fresh = fresh_ref[t]
    # Reads stream the packed sorted buffer exactly like the forward
    # kernel (over-read from the chunk boundary, mask prefix lanes), and
    # gradient chunks are written back at the SAME offsets — the gradient
    # buffer is in packed entry order, no relayout, no pickup gather.
    # Only the first chunk's block can be shared with an earlier tile's
    # writes (tiles run sequentially on the core); when it is
    # (fresh == 0), this tile ACCUMULATES onto it: its masked prefix lanes
    # carry exact zeros, and the earlier tile left exact zeros in the
    # lanes owned here, so the add merges both tiles' entries losslessly.
    base = (start // BLOCK) * BLOCK
    off0 = start - base
    nblocks = jnp.where(cnt > 0, (off0 + cnt + BLOCK - 1) // BLOCK, 0)
    px, py = _pixel_coords(t, tiles_x, offx_ref, offy_ref)
    tri = _tri_incl()
    dma = _make_read_dma(attrs_ref, buf, rsems, base)

    def boundary_read():
        off = pl.multiple_of(base, BLOCK)
        return pltpu.make_async_copy(
            dattrs_ref.at[:, pl.ds(off, BLOCK)], rbuf, bsem)

    @pl.when((nblocks > 0) & (fresh == 0))
    def _():
        boundary_read().start()

    dout = dout_ref[0]                                       # (8, P)
    outres = outres_ref[0]                                   # (8, P)
    ones_col = jnp.ones((NCH, 1), jnp.float32)
    # B = sum_ch dC_ch * C_ch + dTfin * Tfin, per pixel as a (P, 1) column.
    b_tot = jax.lax.dot_general(
        dout * outres, ones_col, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + dtfin_ref[...] * tfin_ref[...]

    def wdma(slot, c):
        # Block c's gradient rows land exactly where its attributes were
        # read: packed sorted entry order, block-aligned.
        off = pl.multiple_of(base + c * BLOCK, BLOCK)
        return pltpu.make_async_copy(
            dbuf.at[slot],
            dattrs_ref.at[:, pl.ds(off, BLOCK)],
            wsems.at[slot],
        )

    @pl.when(nblocks > 0)
    def _():
        dma(0, 0).start()

    def cond(carry):
        c, t_run, _ = carry
        return (c < nblocks) & (jnp.max(t_run) >= T_EPS)

    def sub_step(chunk, sub_base, t_run, q_run):
        alpha, alpha_un, expp, use, dx, dy, ca, cb, cc = _chunk_state(
            chunk, px, py, sub_base, off0, off0 + cnt
        )
        del expp  # dop is recovered from dpower as a row op (see below)
        one_minus = 1.0 - alpha
        lx = jnp.log(one_minus)
        cum = jnp.exp(_cumsum_incl(lx, tri))                 # _cumprod_incl
        t_after = t_run * cum
        keep = t_after >= T_EPS
        t_before = t_run * _excl_from_incl_prod(cum)
        w = jnp.where(keep, alpha * t_before, 0.0)           # (P, G)
        col = chunk[0:NCH, :]
        op = chunk[13:14, :]                                  # (1, G)

        # A[p, g] = c_g . dC_p  (includes only channel rows; row 7 is zero).
        a_dot = jax.lax.dot_general(
            dout, col, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )                                                     # (P, G)
        w_adot = w * a_dot
        q = q_run + _cumsum_incl(w_adot, tri)                 # (P, G) inclusive
        # dpower = dalpha * alpha_un with dalpha = a_dot * t_before -
        # (B - Q)/one_minus, reassociated to reuse computed planes:
        #   a_dot * t_before * alpha_un = w_adot      (alpha = alpha_un on
        #                                              the pgate lanes)
        #   alpha_un/one_minus = alpha_un * exp(-lx)  (reuses the cumprod's
        #                                              log; kills the (P,G)
        #                                              division)
        # and dop_px = dalpha * expp = dpower / op, where op is constant
        # per lane — so dop falls out of csum(dpower) as a (1, G) row op
        # and the whole dop_px plane + its sublane reduction disappear.
        # Float reassociation only; oracle-parity and finite-difference
        # tested (tests/test_rasterizer.py).
        pgate = use & keep & (alpha_un < ALPHA_MAX)
        ratio = alpha_un * jnp.exp(-lx)                       # alpha_un/(1-a)
        dpower = jnp.where(pgate, w_adot - (b_tot - q) * ratio, 0.0)
        # Factor u = dpower*dx, v = dpower*dy: the five gradient rows below
        # are bilinear in (dpower*dx, dpower*dy), so this removes ~6
        # (P, G) VPU multiplies per chunk vs the distributed forms (CSE
        # cannot do this — it is reassociation, not a common
        # subexpression).  Float reassociation only; parity-tested.
        u = dpower * dx
        v = dpower * dy
        # sx = -ddx (and sy = -ddy): the only consumers are dmx = -csum(ddx)
        # and csum(|ddx|), so the (P, G) negation is dead work — reduce the
        # un-negated form.  Likewise the -0.5 / -1 constants move AFTER the
        # sublane reduction onto the (1, G) rows (scalar * is exact, and a
        # power-of-two scale commutes with the sum bit-identically).
        sx = ca * u + cb * v           # = -ddx = dpower * (ca dx + cb dy)
        sy = cc * v + cb * u

        def csum(x):
            return jnp.sum(x, axis=0, keepdims=True)          # (1, G)

        dmx = csum(sx)
        dmy = csum(sy)
        dca = -0.5 * csum(u * dx)
        dcb = -csum(u * dy)
        dcc = -0.5 * csum(v * dy)
        # dop = csum(dpower / op) = csum(dpower) / op (op constant per
        # lane).  op == 0 columns (sanitized culled splats) have dpower
        # exactly 0 — guard the reciprocal so 0 * inf never makes a NaN.
        dop = csum(dpower) * jnp.where(op > 0.0, 1.0 / op, 0.0)
        absx = csum(jnp.abs(sx))
        absy = csum(jnp.abs(sy))
        dcol = jax.lax.dot_general(
            dout, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )                                                     # (8, G)

        dchunk = jnp.concatenate(
            [dcol, dmx, dmy, dca, dcb, dcc, dop, absx, absy],
            axis=0,
        )                                                     # (16, G)

        # TRUE-product transmittance carry (lane CHUNK-1 of t_after), same
        # as the forward kernel: keep matches the oracle's prefix property
        # and the while cond exits once the tile saturates.  (The frozen
        # carry is not needed here — tfin comes in from the forward.)
        t_run = t_after[:, CHUNK - 1:CHUNK]
        # Carry the chunk total: q's summand w * a_dot is zeroed past
        # termination (w masks on keep), so the inclusive cumsum is constant
        # from the last live lane onward and lane CHUNK-1 is exact.  A
        # max-over-keep carry is WRONG here — a_dot is mixed-sign, so the
        # prefix sum is not monotone (regression: multi-chunk grad parity
        # test in tests/test_rasterizer.py).
        q_run = q[:, CHUNK - 1:CHUNK]
        return dchunk, t_run, q_run

    def body(carry):
        c, t_run, q_run = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nblocks)
        def _():
            dma(jax.lax.rem(c + 1, 2), c + 1).start()

        dma(slot, c).wait()
        block = buf[slot]                                    # (NA, BLOCK)
        halves = []
        for h in range(BLOCK // CHUNK):
            dchunk, t_run, q_run = sub_step(
                block[:, h * CHUNK:(h + 1) * CHUNK],
                c * BLOCK + h * CHUNK, t_run, q_run)
            halves.append(dchunk)
        dblock = jnp.concatenate(halves, axis=1)             # (NA, BLOCK)

        @pl.when(c >= 2)
        def _():
            wdma(slot, c - 2).wait()

        # Shared boundary block: accumulate onto the earlier tile's block
        # (see kernel docstring) — prefix lanes here are exact zeros, and
        # the earlier tile left exact zeros in this tile's lanes.
        @pl.when((c == 0) & (fresh == 0))
        def _():
            boundary_read().wait()
            dbuf[slot] = dblock + rbuf[...]

        @pl.when((c != 0) | (fresh != 0))
        def _():
            dbuf[slot] = dblock

        wdma(slot, c).start()
        return c + 1, t_run, q_run

    init = (jnp.int32(0), jnp.ones((P, 1), jnp.float32),
            jnp.zeros((P, 1), jnp.float32))
    c_fin, _, _ = jax.lax.while_loop(cond, body, init)

    # Drain a prefetch left in flight by an early exit.
    @pl.when(c_fin < nblocks)
    def _():
        dma(jax.lax.rem(c_fin, 2), c_fin).wait()

    @pl.when(c_fin >= 2)
    def _():
        wdma(jax.lax.rem(c_fin - 2, 2), c_fin - 2).wait()

    @pl.when(c_fin >= 1)
    def _():
        wdma(jax.lax.rem(c_fin - 1, 2), c_fin - 1).wait()

    # Early termination skipped blocks [c_fin, nblocks): their entries were
    # never composited (zero gradients), but the output region must still be
    # written — fill with zeros, one buffered DMA at a time.
    @pl.when(c_fin < nblocks)
    def _():
        dbuf[0] = jnp.zeros((NA, BLOCK), jnp.float32)

        def zfill(c, _):
            wdma(0, c).start()
            wdma(0, c).wait()
            return 0

        jax.lax.fori_loop(c_fin, nblocks, zfill, 0)


# ----------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ----------------------------------------------------------------------------

def _fwd_call(cfg: _Config, attrs, start, count, offx, offy):
    t_total = cfg.tiles_y * cfg.tiles_x
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((P, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NCH, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NA, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg.tiles_x),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_total, NCH, P), jnp.float32),
            jax.ShapeDtypeStruct((t_total * P, 1), jnp.float32),
        ],
        interpret=cfg.interpret,
    )(start, count, attrs, offx, offy)


def _bwd_call(cfg: _Config, attrs, start, count, fresh, offx, offy, outres,
              tfin, dout, dtfin):
    t_total = cfg.tiles_y * cfg.tiles_x
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((P, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NCH, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NCH, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, NA, BLOCK), jnp.float32),
            pltpu.VMEM((2, NA, BLOCK), jnp.float32),
            pltpu.VMEM((NA, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg.tiles_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NA, cfg.cap_pad), jnp.float32),
        interpret=cfg.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(start, count, fresh, attrs, offx, offy, outres, tfin, dout, dtfin)


@functools.lru_cache(maxsize=None)
def _make_composite(cfg: _Config):
    """Differentiable composite over the packed sorted entry stream.

    ``attrs`` — the 16-row table INCLUDING the AbsGS dummy rows — is
    gathered by binning.gather_idx OUTSIDE this boundary, as one gather.
    The backward kernel writes per-entry gradient rows straight back in
    the same packed entry order (boundary chunks accumulate, see kernel),
    so its output IS the cotangent of the packed attribute gather (rows
    7 re-zeroed; AbsGS grads in rows 14/15), and per-gaussian
    accumulation for ALL rows — real attributes and AbsGS alike — happens
    in that single gather's transpose: exactly one scatter-add per step.
    (Design history: scatter-adds cost ~13 ns/index regardless of row
    count, so the previous separate 2-row AbsGS scatter doubled the
    dominant cost; and any scheme that re-orders the gradient stream — a
    gradient-buffer layout plus a pickup gather, or a materialized
    slot-indexed attribute stream — pays a ~6 ms wide gather or an ~8.5 ms
    1-column gather at 786k entries; see CLAUDE.md.)
    """
    @jax.custom_vjp
    def composite(attrs, start, count, fresh, offx, offy):
        del fresh
        return _fwd_call(cfg, attrs, start, count, offx, offy)

    def fwd(attrs, start, count, fresh, offx, offy):
        out, tfin = _fwd_call(cfg, attrs, start, count, offx, offy)
        return (out, tfin), (attrs, start, count, fresh, offx, offy, out, tfin)

    def bwd(res, cot):
        attrs, start, count, fresh, offx, offy, out, tfin = res
        dout, dtfin = cot
        dpadded = _bwd_call(cfg, attrs, start, count, fresh, offx, offy,
                            out, tfin, dout, dtfin)        # (NA, cap_pad)
        d_attrs = dpadded.at[7, :].set(0.0)
        f0 = lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0)
        return (d_attrs, f0(start), f0(count), f0(fresh),
                jnp.zeros_like(offx), jnp.zeros_like(offy))

    composite.defvjp(fwd, bwd)
    return composite


# ----------------------------------------------------------------------------
# Public entry
# ----------------------------------------------------------------------------

def default_capacity(n: int) -> int:
    """Shape-only fallback capacity: ~4 tiles per splat, block-rounded.

    ONLY for ad-hoc calls with no better information — it undershoots
    badly at high resolutions (80% of entries dropped at 1080p on a
    125k-splat scene).  Production paths measure the real entry count
    (render.measure_bin_capacity / Trainer._update_bin_capacity) instead.
    Overflow drops excess entries and is reported by ops.binning.
    """
    cap = max(1 << 16, 4 * n)
    return -(-cap // BLOCK) * BLOCK


def composite_tiled(
    mean2d: jnp.ndarray,
    conic: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    opacity: jnp.ndarray,
    channels: jnp.ndarray,
    height: int,
    width: int,
    subpixel_offset: Optional[jnp.ndarray] = None,
    mean2d_abs_dummy: Optional[jnp.ndarray] = None,
    cap: Optional[int] = None,
    interpret: Optional[bool] = None,
    inference: bool = False,
    radius_xy: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tile-binned differentiable composite.

    Same contract as ops.rasterize_ref.composite_reference, plus AbsGS
    absolute screen gradients routed into ``mean2d_abs_dummy``'s cotangent.

    Returns:
        (out (H, W, 7) premultiplied channels, T_final (H, W),
         overflow () int32 — duplicated entries dropped because ``cap`` was
         undersized; nonzero means the highest-index splats are missing from
         both the render and its gradients).
    """
    n = mean2d.shape[0]
    nch_in = channels.shape[1]
    if nch_in != NCH - 1:
        raise ValueError(f"expected {NCH - 1} blend channels, got {nch_in}")
    tiles_y, tiles_x = num_tiles(height, width)
    t_total = tiles_y * tiles_x
    if cap is None:
        cap = default_capacity(n)
    if interpret is None:
        interpret = _interpret_default()
    # The gradient buffer shares the packed entry layout: (NA, cap_pad).
    cap = -(-cap // BLOCK) * BLOCK   # block-aligned DMA slicing
    cfg = _Config(tiles_y, tiles_x, cap + BLOCK, interpret,
                  grad_cap=0 if inference else cap + BLOCK)

    binned = bin_gaussians(
        jax.lax.stop_gradient(mean2d),
        jax.lax.stop_gradient(depth),
        radius, height, width, cap=cap, chunk=BLOCK, align=not inference,
        radius_xy=radius_xy,
    )
    gi = binned.gather_idx

    # (N+1, 18) with a trailing dummy row that absorbs dead-slot gradients.
    # The AbsGS dummy rides as the last two columns so its gradients share
    # the attribute gather's single transpose scatter-add (see module doc).
    if mean2d_abs_dummy is None:
        mean2d_abs_dummy = jnp.zeros((n, 2), mean2d.dtype)
    attrs = jnp.concatenate(
        [channels, jnp.zeros((n, 1), channels.dtype), mean2d, conic,
         opacity[:, None], mean2d_abs_dummy],
        axis=1,
    )
    attrs = jnp.pad(attrs, ((0, 1), (0, 0)))

    hp, wp = tiles_y * TILE, tiles_x * TILE
    if subpixel_offset is None:
        offx = jnp.zeros((t_total * P, 1), jnp.float32)
        offy = jnp.zeros((t_total * P, 1), jnp.float32)
    else:
        sp = jnp.pad(
            subpixel_offset,
            ((0, hp - height), (0, wp - width), (0, 0)),
        )
        sp = (
            sp.reshape(tiles_y, TILE, tiles_x, TILE, 2)
            .transpose(0, 2, 1, 3, 4)
            .reshape(t_total * P, 2)
        )
        offx = sp[:, 0:1]
        offy = sp[:, 1:2]

    if inference:
        # Forward-only fast path: no custom VJP, no AbsGS plumbing.
        out, tfin = _fwd_call(cfg, attrs.T[:, gi], binned.tile_start,
                              binned.tile_count, offx, offy)
    else:
        attrs_sorted = attrs.T[:, gi]                        # (16, cap_pad)
        out, tfin = _make_composite(cfg)(
            attrs_sorted, binned.tile_start, binned.tile_count,
            binned.write_fresh, offx, offy,
        )                                                    # (T, 8, P), (T*P, 1)

    img = (
        out.reshape(tiles_y, tiles_x, NCH, TILE, TILE)
        .transpose(0, 3, 1, 4, 2)
        .reshape(hp, wp, NCH)
    )[:height, :width]
    tfin_img = (
        tfin.reshape(tiles_y, tiles_x, TILE, TILE)
        .transpose(0, 2, 1, 3)
        .reshape(hp, wp)
    )[:height, :width]
    return img[..., : NCH - 1], tfin_img, binned.overflow
