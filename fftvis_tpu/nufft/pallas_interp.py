"""Type-2 (fine grid -> nonuniform targets) tap interpolation in Pallas.

The XLA tiled interpolation (:class:`fftvis_tpu.nufft.transform._TiledInterp`)
bins targets into grid tiles at plan time and scans the tiles, paying the
worst tile's static capacity P for every tile (baseline distributions
cluster hard at the uv origin, so P is many times the mean occupancy) plus
a lax.scan dispatch per tile.

This kernel is the fused, occupancy-proportional form (same design as the
Pallas spreader in :mod:`.pallas_spread`, run in reverse; reference anchor:
the interpolation half of finufft type-2/type-3, ref
/root/reference/src/fftvis/cpu/nufft.py:48-118):

- The (wrap-padded, re/im-split) fine grid lives ONCE in VMEM for the whole
  kernel; each tile's (ay, ax) window is a VMEM slice, not a scan-carried
  dynamic_slice program.
- Targets are bin-sorted at plan time (they are host data); each Pallas
  grid step handles one occupied tile, consuming its targets in 128-lane
  chunks via a dynamic ``fori_loop`` -- tiles pay for the targets they
  hold, not for the global worst case.
- Tap factors enter as a packed (2 + 2w, m) payload with targets on lanes;
  the y/x tap matrices are rebuilt in-kernel as one-hot combinations
  (w VPU compare+FMA passes) and contracted against the window on the MXU.
- The output accumulates masked chunks into a VMEM-resident (c2, m) block
  in sorted order; one static take (XLA copies) restores target order.

Mosaic alignment contract: window starts must be provable multiples of the
(8, 128) grain, so tiles are (ity % 8 == 0) x (isx % 128 == 0) and chunk
bases round down to 128 with exact live-masking (targets of neighboring
tiles sharing a chunk window are masked off; the masked adds partition).

Applicability (:func:`pallas_interp_ok`): f32 pipelines and fine grids
whose re/im planes fit VMEM (~6 MB). The XLA tiled form remains the
fallback and the portable path (FFTVIS_INTERP to override).
"""

from __future__ import annotations

import functools

import numpy as np

from .pallas_util import (
    VMEM_BUDGET as _VMEM_BUDGET,
    chunk_size as _chunk_size,
    lane_pad,
    sequential as _sequential,
    sublane_pad,
    vma_of as _vma_of,
)


# Tile shape: ay = ity + w rows x ax = isx + w lanes per window.
_ITY = 32
_ISX = 128


def pallas_interp_ok(nf, w: int, c2: int, m: int, rdtype) -> bool:
    """Whether the Pallas interpolation can run (else the XLA tiled form)."""
    if len(nf) != 2:
        return False
    if np.dtype(rdtype) != np.float32:
        return False
    nfy, nfx = int(nf[0]), int(nf[1])
    if nfy < 8 or nfx < 128:
        return False  # window alignment needs at least one aligned tile
    nty = -(-nfy // _ITY)
    ntx = -(-nfx // _ISX)
    pad_y = nty * _ITY + w - nfy
    pad_x = ntx * _ISX + w - nfx
    if pad_y > nfy or pad_x > nfx:
        return False  # wrap-pad must stay within one period
    gy = nfy + pad_y
    gx = nfx + pad_x
    grid_bytes = c2 * sublane_pad(gy) * lane_pad(gx) * 4
    pc = _chunk_size()
    out_bytes = sublane_pad(c2) * (m + pc) * 4
    # packed payload rows: [offy, offx, w y-taps, w x-taps], sublane-padded
    # (w = 16 -> D = 34 pads to 40, NOT 32).
    packed_bytes = sublane_pad(2 + 2 * w) * (m + pc) * 4
    if grid_bytes + out_bytes + packed_bytes > _VMEM_BUDGET:
        return False
    if nty * ntx > 65536:
        return False
    return True


@functools.lru_cache(maxsize=64)
def _build_interp_call(w: int, c2: int, gy: int, gx: int, T: int,
                       m_pad: int, pc: int, interpret: bool,
                       vma=frozenset()):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ay = _ITY + w
    ax = _ISX + w
    D = 2 + 2 * w

    def kernel(starts_ref, ends_ref, y0s_ref, x0s_ref, packed_ref, grid_ref,
               out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        s0 = starts_ref[t]
        e0 = ends_ref[t]
        sa = (s0 // 128) * 128
        nchunks = (e0 - sa + pc - 1) // pc
        y0 = pl.multiple_of(y0s_ref[t], 8)
        x0 = pl.multiple_of(x0s_ref[t], 128)

        ia_y = jax.lax.broadcasted_iota(jnp.int32, (ay, pc), 0).astype(
            jnp.float32
        )
        ia_x = jax.lax.broadcasted_iota(jnp.int32, (ax, pc), 0).astype(
            jnp.float32
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)

        def chunk(k, _):
            off = pl.multiple_of(sa + k * pc, 128)
            sl = packed_ref[:, pl.ds(off, pc)]  # (D, Pc)
            idx = off + lane
            live = ((idx >= s0) & (idx < e0)).astype(jnp.float32)  # (1, Pc)
            offy = sl[0:1, :]  # window-relative first-tap rows (ints in f32)
            offx = sl[1:2, :]
            # One-hot tap matrices: kyT[a, p] = tv_y[k, p] at a == offy+k.
            ky = jnp.zeros((ay, pc), jnp.float32)
            kx = jnp.zeros((ax, pc), jnp.float32)
            for k2 in range(w):
                ky = ky + sl[2 + k2 : 3 + k2, :] * (ia_y == offy + k2)
                kx = kx + sl[2 + w + k2 : 3 + w + k2, :] * (ia_x == offx + k2)
            ky = ky * live
            for ci in range(c2):
                win = grid_ref[ci, pl.ds(y0, ay), pl.ds(x0, ax)]  # (ay, ax)
                tmp = jax.lax.dot_general(
                    win, ky, (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # (ax, Pc) on the MXU (full f32: ES taps span ~13
                # orders of magnitude; bf16 passes cost ~2.5e-3 here)
                red = jnp.sum(tmp * kx, axis=0, keepdims=True)  # (1, Pc)
                cur = out_ref[ci : ci + 1, pl.ds(off, pc)]
                out_ref[ci : ci + 1, pl.ds(off, pc)] = cur + red
            return 0

        jax.lax.fori_loop(0, nchunks, chunk, 0, unroll=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # padded grid planes
        ],
        out_specs=pl.BlockSpec((c2, m_pad), lambda t, *_: (0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c2, m_pad), jnp.float32, vma=vma),
        interpret=interpret,
    )


class PallasInterp:
    """Host-planned, occupancy-proportional Pallas tap interpolation.

    Drop-in for :class:`fftvis_tpu.nufft.transform._TiledInterp`:
    ``PallasInterp(plan2d, sel)(G) -> (C', m) complex``.
    """

    def __init__(self, plan2d, sel=None):
        ti0 = plan2d.tap_idx[0] if sel is None else plan2d.tap_idx[0][sel]
        ti1 = plan2d.tap_idx[1] if sel is None else plan2d.tap_idx[1][sel]
        tv0 = plan2d.tap_val[0] if sel is None else plan2d.tap_val[0][sel]
        tv1 = plan2d.tap_val[1] if sel is None else plan2d.tap_val[1][sel]
        nfy, nfx = (int(v) for v in plan2d.nf)
        w = plan2d.kernel.w
        m = ti0.shape[0]
        pc = _chunk_size()

        k0y = ti0[:, 0].astype(np.int64)  # window starts, already mod nf
        k0x = ti1[:, 0].astype(np.int64)
        tiy = k0y // _ITY
        tix = k0x // _ISX
        nty = -(-nfy // _ITY)
        ntx = -(-nfx // _ISX)
        self.pad_y = nty * _ITY + w - nfy
        self.pad_x = ntx * _ISX + w - nfx
        if self.pad_y > nfy or self.pad_x > nfx:
            raise ValueError("interp tile larger than the grid period")
        tid = tiy * ntx + tix
        order = np.argsort(tid, kind="stable")
        tid_sorted = tid[order]
        uniq, counts = np.unique(tid_sorted, return_counts=True)
        T = max(int(uniq.size), 1)

        self.w = w
        self.m = m
        self.T = T
        self.nf = (nfy, nfx)
        self.m_pad = m + pc
        ends = np.cumsum(counts)
        starts = ends - counts
        ty0 = (uniq // ntx * _ITY).astype(np.int32)
        tx0 = (uniq % ntx * _ISX).astype(np.int32)

        # Packed tap payload, targets on lanes, bin-sorted: rows are
        # [offy, offx, tvy_0..tvy_{w-1}, tvx_0..tvx_{w-1}].
        D = 2 + 2 * w
        packed = np.zeros((D, self.m_pad), dtype=np.float32)
        packed[0, :m] = (k0y[order] - ty0.repeat(counts)).astype(np.float32)
        packed[1, :m] = (k0x[order] - tx0.repeat(counts)).astype(np.float32)
        packed[2 : 2 + w, :m] = tv0[order].T.astype(np.float32)
        packed[2 + w :, :m] = tv1[order].T.astype(np.float32)
        self.packed = packed
        if uniq.size == 0:  # degenerate: no targets -> one empty tile
            starts = np.zeros(1, np.int64)
            ends = np.zeros(1, np.int64)
            ty0 = np.zeros(1, np.int32)
            tx0 = np.zeros(1, np.int32)
        self.starts = starts.astype(np.int32)
        self.ends = ends.astype(np.int32)
        self.tile_y0 = ty0
        self.tile_x0 = tx0
        # Inverse permutation: out (sorted order) -> target order.
        inv = np.empty(m, dtype=np.int64)
        inv[order] = np.arange(m)
        self.inv = inv.astype(np.int32)

    def __call__(self, G):
        """G: (C', nfy, nfx) complex -> (C', m) complex."""
        import jax
        import jax.numpy as jnp

        nfy, nfx = self.nf
        C = G.shape[0]
        c2 = 2 * C
        pc = _chunk_size()
        Gr = jnp.concatenate(
            [jnp.real(G), jnp.imag(G)], axis=0
        ).astype(jnp.float32)
        # Wrap-pad so every tile window (through the last, possibly
        # grid-overhanging tile) is contiguous.
        Gr = jnp.concatenate([Gr, Gr[:, : self.pad_y, :]], axis=1)
        Gr = jnp.concatenate([Gr, Gr[:, :, : self.pad_x]], axis=2)
        gy = nfy + self.pad_y
        gx = nfx + self.pad_x

        interpret = jax.default_backend() != "tpu"
        call = _build_interp_call(
            self.w, c2, gy, gx, self.T, self.m_pad, pc, interpret,
            vma=_vma_of(Gr),
        )
        # pallas_call has no batching rule; under an outer vmap (the engine
        # batches the frequency axis) lower to a sequential scan instead.
        flat = _sequential(call)(
            jnp.asarray(self.starts),
            jnp.asarray(self.ends),
            jnp.asarray(self.tile_y0),
            jnp.asarray(self.tile_x0),
            jnp.asarray(self.packed),
            Gr,
        )  # (c2, m_pad) in sorted order
        res = flat[:, jnp.asarray(self.inv)]  # static take: copies
        return (res[:C] + 1j * res[C:]).astype(G.dtype)
