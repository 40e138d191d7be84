"""Tile-binned 2D ES spreading as a Pallas TPU kernel.

The XLA tiled spreader (:func:`fftvis_tpu.nufft.transform._spread_tiled_matmul`)
executes one (rows x P) @ (P x 2C*cols) matmul per tile under ``lax.scan``,
materializes every tile patch to HBM, and assembles the grid with a 9-pass
pad/reshape overlap-add. That shape pays three taxes the hardware does not
require: scan-step dispatch overhead per tile, HBM round-trips for the patch
tensor, and a static per-tile source capacity (the host must bound the worst
tile's occupancy, with balanced-occupancy "classes" to claw back the slack).

This module is the fused alternative (reference anchor: the spreading half of
finufft's type-1/type-3, ref /root/reference/src/fftvis/cpu/nufft.py:48-175 --
the reference outsources it to C++/OpenMP; here it is a hand-scheduled TPU
kernel):

- The Pallas grid walks tiles row-major; each kernel instance evaluates the
  ES kernel factors on the VPU and their outer-product patch on the MXU.
- A band accumulator -- one tile-row of the padded frame -- lives in VMEM as
  a revisited output block, so patch accumulation is a VMEM read-modify-write
  and each band crosses HBM exactly once.
- Per-tile work is a ``fori_loop`` over occupancy CHUNKS (``Pc`` sources at a
  time, from the bin-sorted contiguous layout): tiles pay for the sources
  they actually hold, rounded up to one chunk. There is no capacity bound to
  derive, no class schedule, and no silent-drop failure mode: every source is
  spread exactly once regardless of how skewed the sky is. This also removes
  the XLA type-3 path's block-size dilemma (its tile scan costs static
  capacity per source block, so the engine runs type-3 as one giant block;
  occupancy-proportional chunks are block-size-insensitive).

Measured on v5e (the forced-type-3 bench geometry, nf=(1200, 576), 4k
sources): 0.07 ms vs 0.72 ms for the XLA tiled spreader -- ~10x. TPU grids
execute sequentially (pipelined, not parallel), which is what makes the
in-band accumulation race-free by construction.

Mosaic alignment contract (the reason for the two data layouts here):
dynamic vector-memory offsets must be *provably* aligned -- lane (minor) dim
offsets to 128, sublane (second-minor) offsets to 8. So the packed source
payload is stored transposed, (D, n), with sources on lanes and chunk bases
rounded down to multiples of 128 (over-read rows are exactly live-masked),
and the band is laid out (c2, gx, hw) with the dynamic x-window on the
sublane dim (callers force sx % 8 == 0).

Numerics match the XLA spreaders: coordinates enter as the shared cell/frac
decomposition (optionally DS-refined), so kernel arguments are integer-exact
distances minus a ~ulp(1) fraction at any grid size.

Applicability (checked by :func:`pallas_spread_ok`): f32 pipelines (the TPU
engine path; TPU has no f64) and source blocks whose (D, n) payload fits
VMEM alongside a double-buffered band (~10^5-source blocks at c2=2). On
non-TPU backends the kernel runs in interpreter mode (tests exercise it on
CPU); the XLA spreaders remain the portable fallback.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from .kernels import es_kernel_grid
from .pallas_util import (
    VMEM_BUDGET as _VMEM_BUDGET,
    bin_sort_csr,
    chunk_size as _chunk_size,
    interpret_shardmap_blocked,  # noqa: F401  (re-export: historical home)
    lane_pad,
    sequential as _sequential,
    sublane_pad,
    vma_of as _vma_of,  # noqa: F401  (re-export: historical home)
)


def _geometry(nf, w: int, ty: int, sx: int):
    """Static tile/band geometry shared by the gate and the kernel."""
    nfy, nfx = int(nf[0]), int(nf[1])
    m = w // 2 + 2  # kernel halo + rounding slack per side (as XLA tiled)
    nty = -(-nfy // ty)
    ntx = -(-nfx // sx)
    hw = ty + 2 * m  # band height (kernel support window)
    xw = sx + 2 * m  # per-tile column window
    gy = nty * ty + 2 * m
    gx = ntx * sx + 2 * m
    return nfy, nfx, m, nty, ntx, hw, xw, gy, gx


def pallas_tile_shape(nf, w: int, c2: int, tile_config=None):
    """(ty, sx) for the Pallas spreader: planner tile with sx 8-aligned.

    The band's x axis is its sublane dimension, and Mosaic requires the
    per-tile dynamic window offsets (multiples of sx) to be provable
    multiples of the 8-row sublane grain.
    """
    from .transform import pick_tile_shape

    ty, sx = (
        tile_config[:2] if tile_config is not None
        else pick_tile_shape(nf, w, c2)
    )
    sx = max(8, (sx // 8) * 8)
    return int(ty), int(sx)


def pallas_spread_ok(nf, w: int, ty: int, sx: int, c2: int, n: int,
                     rdtype) -> bool:
    """Whether the Pallas spreader can run this problem (else XLA fallback)."""
    if len(nf) != 2:
        return False
    if np.dtype(rdtype) != np.float32:
        return False  # TPU has no f64; keep interpret-mode semantics equal
    if sx % 8 != 0:
        return False  # band window offsets must sit on the sublane grain
    nfy, nfx, m, nty, ntx, hw, xw, gy, gx = _geometry(nf, w, ty, sx)
    pad_y_hi = gy - m - nfy
    pad_x_hi = gx - m - nfx
    if pad_y_hi > nfy or pad_x_hi > nfx or m > nfy or m > nfx:
        return False  # pads would wrap more than one period
    if m > ty:
        # The y overlap-add splits each band into (m, ty, m)-row segments
        # padded up to ty rows; a tile override (FFTVIS_TILE) shorter than
        # the halo would need a negative pad. Planner tiles never hit this.
        return False
    pc = _chunk_size()
    # VMEM estimate: packed (D, n+Pc) sublane-pads D -> 8; band block
    # (c2, gx, hw) sublane/lane pads, double-buffered by the pipeline.
    D = 4 + c2
    packed_bytes = sublane_pad(D) * (n + pc) * 4
    band_bytes = c2 * sublane_pad(gx) * lane_pad(hw) * 4 * 2
    if packed_bytes + band_bytes > _VMEM_BUDGET:
        return False
    if nty * ntx > 65536:
        return False  # SMEM prefetch tables
    return True


@functools.lru_cache(maxsize=64)
def _build_pallas_call(nf, w: int, beta: float, ty: int, sx: int, c2: int,
                       pc: int, interpret: bool, vma=frozenset()):
    """Compile-cached pallas_call for one static geometry."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nfy, nfx, m, nty, ntx, hw, xw, gy, gx = _geometry(nf, w, ty, sx)
    assert sx % 8 == 0 and pc % 128 == 0

    def kernel(starts_ref, ends_ref, packed_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        t = i * ntx + j

        @pl.when(j == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        s0 = starts_ref[t]
        e0 = ends_ref[t]
        sa = (s0 // 128) * 128  # lane-aligned chunk base; masked below
        nchunks = (e0 - sa + pc - 1) // pc

        # Absolute frame coordinates of this tile's window. Band row r is
        # grid column j*sx - m + r; band lane c is grid row i*ty - m + c.
        y0 = (i * ty - m).astype(jnp.float32)
        x0 = (j * sx - m).astype(jnp.float32)
        bx0 = pl.multiple_of(j * sx, 8)  # band x of the window start

        # Transposed orientation: sources on lanes. Mosaic's iota is
        # integer-only; cast to f32 afterwards.
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (hw, pc), 0).astype(
                jnp.float32
            )
            + y0
        )
        cols = (
            jax.lax.broadcasted_iota(jnp.int32, (xw, pc), 0).astype(
                jnp.float32
            )
            + x0
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)

        def chunk(k, _):
            off = pl.multiple_of(sa + k * pc, 128)
            sl = packed_ref[:, pl.ds(off, pc)]  # (D, Pc) contiguous lanes
            idx = off + lane
            live = ((idx >= s0) & (idx < e0)).astype(jnp.float32)  # (1, Pc)
            # (rows - cell) is integer-exact in f32; the ~ulp(1) fraction
            # is subtracted last (pads handle wraps -- no periodic fold).
            ky = es_kernel_grid(
                (rows - sl[0:1, :]) - sl[1:2, :], w, beta, xp=jnp
            ) * live  # (hw, Pc)
            kx = es_kernel_grid(
                (cols - sl[2:3, :]) - sl[3:4, :], w, beta, xp=jnp
            )  # (xw, Pc)
            for ci in range(c2):
                rhs = kx * (sl[4 + ci : 5 + ci, :] * live)  # (xw, Pc)
                patch = jax.lax.dot_general(
                    rhs, ky, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # (xw, hw) on the MXU (full f32 -- never bf16 passes:
                # the trace context's matmul precision must not matter)
                cur = out_ref[0, ci, pl.ds(bx0, xw), :]
                out_ref[0, ci, pl.ds(bx0, xw), :] = cur + patch
            return 0

        jax.lax.fori_loop(0, nchunks, chunk, 0, unroll=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, c2, gx, hw), lambda i, j, *_: (i, 0, 0, 0)
        ),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (nty, c2, gx, hw), jnp.float32, vma=vma
        ),
        interpret=interpret,
    )
    return call


def spread_pallas_tiled(u_list, weights, nf, w: int, beta: float,
                        ty: int, sx: int, u_lo_list=None):
    """2D ES spreading via the Pallas band-accumulator kernel.

    Same contract as the XLA spreaders: ``u_list`` per-dim grid coordinates
    in [0, nf_d), ``weights`` (C, n) complex; returns the (C, nfy, nfx)
    complex fine grid. Caller must have checked :func:`pallas_spread_ok`.
    """
    import jax
    import jax.numpy as jnp

    from .transform import _fold_frame, _split_cell_frac

    nfy, nfx, m, nty, ntx, hw, xw, gy, gx = _geometry(nf, w, ty, sx)
    C, n = weights.shape
    c2 = 2 * C
    pc = _chunk_size()
    rdtype = jnp.finfo(jnp.result_type(weights, 0.0)).dtype
    uy = u_list[0].astype(rdtype)
    ux = u_list[1].astype(rdtype)

    # --- XLA pre-pass: bin-sort sources with the payload packed wide ---
    tiy = jnp.clip((uy // ty).astype(jnp.int32), 0, nty - 1)
    tix = jnp.clip((ux // sx).astype(jnp.int32), 0, ntx - 1)
    tid = tiy * ntx + tix
    vals = jnp.concatenate(
        [jnp.real(weights), jnp.imag(weights)], axis=0
    ).astype(rdtype)
    cy, fy = _split_cell_frac(
        uy, None if u_lo_list is None else u_lo_list[0].astype(rdtype), jnp
    )
    cx, fx = _split_cell_frac(
        ux, None if u_lo_list is None else u_lo_list[1].astype(rdtype), jnp
    )
    packed = jnp.concatenate(
        [cy[None], fy[None], cx[None], fx[None], vals], axis=0
    )  # (D, n): sources on the lane axis
    # The sort-carry variant (multi-operand sort instead of a post-sort
    # lane gather) measured a wash on v5e; knob kept for other generations.
    packed_sorted, starts, ends, _ = bin_sort_csr(
        tid, packed, nty * ntx, pc,
        sort_carry=os.environ.get("FFTVIS_SORT_CARRY", "0") == "1",
    )

    interpret = jax.default_backend() != "tpu"
    call = _build_pallas_call(
        (nfy, nfx), w, float(beta), ty, sx, c2, pc, interpret,
        vma=_vma_of(starts, ends, packed_sorted),
    )
    # pallas_call has no batching rule; under an outer vmap (the engine
    # batches the frequency axis) lower to a sequential scan instead.
    bands = _sequential(call)(starts, ends, packed_sorted)  # (nty, c2, gx, hw)
    bands = bands.transpose(0, 1, 3, 2)  # (nty, c2, hw, gx)

    # --- XLA post-pass: y overlap-add of adjacent bands into the frame ---
    frame = jnp.zeros((c2, gy, gx), dtype=rdtype)
    segs_y = ((0, m, 0), (m, ty, m), (m + ty, m, ty + m))  # (src, h, dst)
    for sy, hy, oy in segs_y:
        seg = bands[:, :, sy : sy + hy, :]  # (nty, c2, hy, gx)
        seg = seg.transpose(1, 0, 2, 3)
        seg = jnp.pad(seg, ((0, 0), (0, 0), (0, ty - hy), (0, 0)))
        seg = seg.reshape(c2, nty * ty, gx)
        seg = seg[:, : min(nty * ty, gy - oy)]
        seg = jnp.pad(seg, ((0, 0), (oy, gy - oy - seg.shape[1]), (0, 0)))
        frame = frame + seg

    return _fold_frame(frame, nfy, nfx, m, C, weights.dtype)
