"""Channels-last beam-table interpolation as a Pallas TPU kernel.

``map_coordinates_2d_cl`` (beams/interp.py) evaluates tabulated beams with
XLA gathers: (npts x taps) row fetches from a (ny*nx, ch) view. Gathers are
the TPU's weakest primitive; this kernel was built to attack them on the
stacked per-antenna/eigenbeam tables (ch = nbeams x reim x nvec x nfeed,
up to ~300 channels).

MEASURED OUTCOME (v5e, scored north-star and eigenbeam rows): PARITY with
the gather path (1.01x / 0.95x full-row device time, outputs bit-matched
at ~1e-7). The channels-last table layout already amortizes each tap
gather over a contiguous ~1.2 KB channel vector, leaving beam evaluation
at only ~2 ms of those rows -- the dominant fusions are the separable-DFT
/ coherency matmuls, which are MXU work XLA already schedules well. The
kernel is therefore an OPT-IN alternative (FFTVIS_BEAM_EVAL=pallas), kept
because it is verified, occupancy-proportional, and the balance may
differ on other TPU generations or table shapes.

This kernel is the gather-free form, following the same occupancy-
proportional design as the NUFFT Pallas kernels (nufft/pallas_spread.py,
nufft/pallas_interp.py) with two twists:

- Interpolation coordinates are DEVICE values (per-time az/za), so the
  2D (y-row x x-col) tile binning happens on device: one sort + CSR
  per call, the same pre-pass the spreader uses.
- The table can exceed VMEM (stacked 37-beam polarized tables are ~20 MB),
  and overlapping tile windows cannot be expressed by BlockSpec index
  maps nor reshaped in-kernel (Mosaic cannot cross the sublane/lane
  boundary), so the XLA pre-pass materializes the per-tile windows
  FLATTENED, (T, ay*ax, chp) -- T static slices XLA fuses -- and the
  kernel consumes them as auto-pipelined (1, ay*ax, chp) blocks.

Per occupancy chunk (128 sources on lanes), tap indices/weights are
computed IN KERNEL from the packed (y, x) coordinates with semantics
matching :func:`fftvis_tpu.beams.interp.map_coordinates_2d_cl` exactly:
order-1 clamp (y) / clamp-or-periodic (x), order-3 mirror boundaries with
the cubic B-spline basis (prefiltered tables, as before). Cell indices are
taken with an exact floor of the UNSHIFTED coordinate (integer arithmetic
in f32 afterwards), so the kernel introduces no coordinate rounding beyond
the gather path's own. The separable tap factors are built as one-hot
matrices directly in the flattened (Pc, ay*ax) shape and applied as ONE
deep MXU contraction per chunk -- a chain of ay shallow dots measured
MXU-latency-bound at 0.7-0.9x the gather path before this. Output
accumulates masked chunks into a (m_pad, ch) block in sorted order; one
wide row-gather (which TPUs amortize well, unlike tap gathers) restores
source order.

Wrap/clamp handling: the x axis is pre-padded by 8 columns on each side
(wrap copies for periodic azimuth, zeros otherwise -- clamped/mirrored
indices never touch the pads), so in-kernel tap columns never wrap; the
window's x-margin covers the +/-2 tap reach. The y axis is row-padded to
the tile lattice with zeros; clamped/mirrored tap rows always land on
real rows inside the tile's 24-row window.

Domain: coordinates are expected within ~one period of the grid (the beam
interface enforces the za domain at prepare time and azimuth is modular);
an extremely out-of-range order-3 coordinate whose mirrored taps fall
outside the tile window would drop, where the gather path would still
reflect it -- not a reachable state through the beam API.

Applicability (:func:`pallas_beam_eval_ok`): f32 tables, windows that fit
VMEM alongside the accumulators. The gather path remains the fallback and
the portable implementation.
"""

from __future__ import annotations

import functools

import numpy as np

from ..nufft.pallas_util import (
    bin_sort_csr,
    chunk_size as _chunk_size,
    lane_pad,
    sequential as _sequential,
    sublane_pad,
    vma_of as _vma_of,
)

# This kernel's VMEM budget is its own: unlike the spread/interp kernels
# (whose shared 10 MB budget leaves room for deep pipelining), the
# evaluator's full resident set is modeled explicitly below, so only
# Mosaic's own overhead needs headroom out of the chip's ~16 MB. The
# measured-parity engine workload (4k-source blocks x 296-channel
# north-star tables) sits at ~10 MB resident and must stay admitted.
_EVAL_VMEM_BUDGET = 14 * 1024 * 1024

# Tile shape over the (padded) table: 8 y-rows x 16 x-cols per tile, with
# margin tiles inside each window.
_TY = 8
_TX = 16
_AY = 3 * _TY   # 24-row window: covers order-3 taps and edge mirrors
_AX = 2 * _TX   # 32-col window
_PADL = 8       # x pre-pad columns on each side


def pallas_beam_eval_ok(ny: int, nx: int, ch: int, order: int,
                        dtype, npts: int) -> bool:
    """Whether the Pallas evaluator can run this problem (else gathers).

    Unlike the spread/interp kernels (whose outputs are band/target
    blocks), this kernel keeps the FULL (npts + Pc, chp) output block and
    the (2, npts + Pc) packed coordinates resident in VMEM, so the point
    count bounds admission too.
    """
    if np.dtype(dtype) != np.float32:
        return False
    if order not in (1, 3):
        return False
    if ny < 2 or nx < 2:
        return False
    pc = _chunk_size()
    chp = lane_pad(ch)
    m_pad = int(npts) + pc
    # Resident buffers: double-buffered (ay*ax, chp) window blocks, the
    # (m_pad, chp) output accumulator, the (2, m_pad) coords (sublane-
    # padded), and per-chunk scratch (KY/KX/W one-hot factors at
    # (Pc, ay*ax) plus the (Pc, chp) contraction result).
    win_bytes = _AY * _AX * chp * 4 * 2
    out_bytes = m_pad * chp * 4
    coords_bytes = sublane_pad(2) * lane_pad(m_pad) * 4
    scratch_bytes = 3 * pc * (_AY * _AX) * 4 + 2 * pc * chp * 4
    total = win_bytes + out_bytes + coords_bytes + scratch_bytes
    if total > _EVAL_VMEM_BUDGET:
        return False
    return True


@functools.lru_cache(maxsize=64)
def _build_eval_call(ny: int, nx: int, ch: int, order: int, wrap_x: bool,
                     nyp: int, nxp: int, nty: int, ntx: int, m_pad: int,
                     pc: int, interpret: bool, vma=frozenset()):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = nty * ntx
    padl = _PADL

    def kernel(starts_ref, ends_ref, y0s_ref, x0s_ref, coords_ref, win_ref,
               out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        s0 = starts_ref[t]
        e0 = ends_ref[t]
        sa = (s0 // 128) * 128
        nchunks = (e0 - sa + pc - 1) // pc

        w0yf = y0s_ref[t].astype(jnp.float32)
        w0xf = x0s_ref[t].astype(jnp.float32)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (pc, 1), 0)
        # Flattened window coordinates: lane j of the (Pc, ay*ax) weight
        # matrix addresses window row j // ax, column j % ax.
        ia = jax.lax.broadcasted_iota(jnp.int32, (pc, _AY * _AX), 1)
        ia_yT = (ia // _AX).astype(jnp.float32)
        ia_xT = (ia % _AX).astype(jnp.float32)

        def _fold(v, n):
            # v mod n via floor division, with a correction step: XLA may
            # lower division by a constant as a reciprocal multiply, so
            # floor(k*n / n) lands off by one EXACTLY at multiples of n
            # (caught by the fuzz soak at x in [nx, nx+1)). The inputs are
            # integer-valued f32 well inside 2^24, so the true remainder
            # is exact once the quotient is corrected.
            q = jnp.floor(v / n)
            r = v - n * q
            r = jnp.where(r >= n, r - n, r)
            return jnp.where(r < 0, r + n, r)

        def _mirror(i, n):
            # scipy 'mirror' boundary: reflect about the edges, period 2n-2.
            if n == 1:
                return jnp.zeros_like(i)
            p = 2 * n - 2
            j = _fold(jnp.abs(i), p)
            return jnp.where(j >= n, p - j, j)

        def _bspline3(tf):
            t2 = tf * tf
            t3 = t2 * tf
            return (
                (1.0 - 3.0 * tf + 3.0 * t2 - t3) / 6.0,
                (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0,
                (1.0 + 3.0 * tf + 3.0 * t2 - 3.0 * t3) / 6.0,
                t3 / 6.0,
            )

        if order == 1:
            def taps_y(yv):
                y0 = jnp.clip(jnp.floor(yv), 0.0, float(ny - 1))
                ty = jnp.clip(yv - y0, 0.0, 1.0)
                y1 = jnp.minimum(y0 + 1.0, float(ny - 1))
                return ((y0, 1.0 - ty), (y1, ty))

            def taps_x(xv):
                if wrap_x:
                    # The fractional part comes from the RAW coordinate
                    # (a float mod would shift it by ~ulp(nx)); only the
                    # integer cell is folded, exactly, and the pads carry
                    # the wrap columns.
                    x0 = jnp.floor(xv)
                    tx = xv - x0
                    cm = _fold(x0, nx)
                    return (
                        (cm + padl, 1.0 - tx),
                        (cm + 1.0 + padl, tx),
                    )
                x0 = jnp.clip(jnp.floor(xv), 0.0, float(nx - 1))
                tx = jnp.clip(xv - x0, 0.0, 1.0)
                x1 = jnp.minimum(x0 + 1.0, float(nx - 1))
                return ((x0 + padl, 1.0 - tx), (x1 + padl, tx))
        else:
            def taps_y(yv):
                y0 = jnp.floor(yv)
                ws = _bspline3(yv - y0)
                return tuple(
                    (_mirror(y0 + (k - 1), ny), wk)
                    for k, wk in enumerate(ws)
                )

            def taps_x(xv):
                x0 = jnp.floor(xv)
                ws = _bspline3(xv - x0)
                if wrap_x:
                    # Fold only the integer cell (exact); taps then reach
                    # [-1, nx+1] and the 8-col pads cover them without any
                    # further modular fold.
                    cm = _fold(x0, nx)
                    return tuple(
                        (cm + (k - 1) + padl, wk)
                        for k, wk in enumerate(ws)
                    )
                return tuple(
                    (_mirror(x0 + (k - 1), nx) + padl, wk)
                    for k, wk in enumerate(ws)
                )

        def chunk(k, _):
            off = pl.multiple_of(sa + k * pc, 128)
            sl = coords_ref[:, pl.ds(off, pc)]  # (2, Pc)
            idx = off + lane_c
            live = ((idx >= s0) & (idx < e0)).astype(jnp.float32)  # (Pc, 1)
            yx = jax.lax.transpose(sl, (1, 0))  # (Pc, 2)
            yv_c = yx[:, 0:1]
            xv_c = yx[:, 1:2]

            # Separable one-hot weights built DIRECTLY in the flattened
            # (Pc, ay*ax) shape (Mosaic cannot reshape across the
            # sublane/lane boundary in-kernel): a chain of ay shallow
            # (K=ax) dots is MXU-latency-bound (measured 0.7-0.9x the
            # gather path); this single K=ay*ax contraction pipelines the
            # systolic array properly.
            KY = jnp.zeros((pc, _AY * _AX), jnp.float32)
            for row, wk in taps_y(yv_c):
                KY = KY + wk * (ia_yT == (row - w0yf))
            KX = jnp.zeros((pc, _AY * _AX), jnp.float32)
            for col, wk in taps_x(xv_c):
                KX = KX + wk * (ia_xT == (col - w0xf))
            W = KY * KX * live
            val = jax.lax.dot_general(
                W, win_ref[0], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (Pc, ch)
            cur = out_ref[pl.ds(off, pc), :]
            out_ref[pl.ds(off, pc), :] = cur + val
            return 0

        jax.lax.fori_loop(0, nchunks, chunk, 0, unroll=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed coords (2, m)
            # Per-tile flattened windows, auto-pipelined by the grid.
            pl.BlockSpec((1, _AY * _AX, ch), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, ch), lambda t, *_: (0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, ch), jnp.float32, vma=vma),
        interpret=interpret,
    )


def pallas_map_coordinates_cl(data, y, x, order: int = 1,
                              wrap_x: bool = False):
    """Drop-in for :func:`...interp.map_coordinates_2d_cl` on TPU.

    data: (ny, nx, ch) float32 (order 3: prefiltered); y, x: (npts,)
    fractional coordinates. Returns (npts, ch) float32.
    """
    import jax
    import jax.numpy as jnp

    ny, nx, ch = (int(v) for v in data.shape)
    n = int(y.shape[0])
    pc = _chunk_size()

    # --- XLA pre-pass: pad the table, mod/bin/sort the coordinates ---
    if wrap_x:
        # Modular indexing, not plain slices: a table narrower than the
        # pad (nx < 8) must TILE periodically, or the pre-pads come up
        # short and the padded width drifts below the window extent
        # (found by the fuzz soak: nx=5 wrap built a 24-wide table for a
        # 32-wide window slice).
        left = data[:, np.arange(-_PADL, 0) % nx, :]
        right = data[:, np.arange(_PADL) % nx, :]
    else:
        left = jnp.zeros((ny, _PADL, ch), data.dtype)
        right = jnp.zeros((ny, _PADL, ch), data.dtype)
    padded = jnp.concatenate([left, data, right], axis=1)
    nxp_real = nx + 2 * _PADL
    nty = max(-(-ny // _TY), 3)
    ntx = max(-(-nxp_real // _TX), 2)
    nyp = nty * _TY
    nxp = ntx * _TX
    # The DMA window's minor-dim extent must be lane-aligned (Mosaic
    # memref_slice contract), so the channel axis pads to 128.
    chp = -(-ch // 128) * 128
    padded = jnp.pad(
        padded,
        ((0, nyp - ny), (0, nxp - nxp_real), (0, chp - ch)),
    ).astype(jnp.float32)

    yv = y.astype(jnp.float32)
    xv = x.astype(jnp.float32)

    # Tile binning over the padded axes (clip handles out-of-range y,
    # whose clamped/mirrored taps land in the edge tiles' windows). The
    # RAW coordinates ship to the kernel -- cells fold there, exactly;
    # binning needs only the integer cell, folded the same way.
    cxf = jnp.floor(xv)
    if wrap_x:
        # Same corrected fold as the kernel (reciprocal-multiply division
        # lowers floor(k*n / n) off by one at exact multiples of n); the
        # binning tile and the kernel's folded cell must agree.
        q = jnp.floor(cxf / nx)
        cxf = cxf - nx * q
        cxf = jnp.where(cxf >= nx, cxf - nx, cxf)
        cxf = jnp.where(cxf < 0, cxf + nx, cxf)
    else:
        cxf = jnp.clip(cxf, 0.0, float(nx - 1))
    tiy = jnp.clip((yv // _TY).astype(jnp.int32), 0, nty - 1)
    tix = jnp.clip(
        ((cxf + _PADL) // _TX).astype(jnp.int32), 0, ntx - 1
    )
    tid = tiy * ntx + tix
    coords = jnp.stack([yv, xv], axis=0)  # (2, n)
    coords_sorted, starts, ends, perm = bin_sort_csr(
        tid, coords, nty * ntx, pc
    )

    # Per-tile windows, flattened to (ay*ax, chp) OUTSIDE the kernel
    # (Mosaic cannot reshape across the sublane/lane boundary): the tile
    # list is static, so this is T static slices + one reshape that XLA
    # fuses; window origins ship as prefetch scalars for the in-kernel
    # one-hot offsets.
    y0s_np = np.clip(
        (np.arange(nty)[:, None] - 1) * _TY, 0, nyp - _AY
    ).repeat(ntx, axis=1).reshape(-1)
    x0s_np = np.clip(
        np.arange(ntx)[None, :] * _TX - 8, 0, nxp - _AX
    ).repeat(nty, axis=0).reshape(-1)
    windows = jnp.stack(
        [
            jax.lax.slice(
                padded, (int(y0), int(x0), 0),
                (int(y0) + _AY, int(x0) + _AX, chp),
            )
            for y0, x0 in zip(y0s_np, x0s_np)
        ]
    ).reshape(nty * ntx, _AY * _AX, chp)

    interpret = jax.default_backend() != "tpu"
    m_pad = n + pc
    call = _build_eval_call(
        ny, nx, chp, order, bool(wrap_x), nyp, nxp, nty, ntx, m_pad, pc,
        interpret, vma=_vma_of(coords_sorted, padded),
    )

    out_sorted = _sequential(call)(
        starts, ends, jnp.asarray(y0s_np, jnp.int32),
        jnp.asarray(x0s_np, jnp.int32), coords_sorted, windows
    )  # (m_pad, ch) in sorted order
    # Wide contiguous rows amortize this single gather (unlike tap
    # gathers); restore source order. inv: position of target j in the
    # sorted layout (second output of sorting by perm).
    _, inv = jax.lax.sort(
        (perm, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    return jnp.take(out_sorted[:n, :ch], inv, axis=0)
