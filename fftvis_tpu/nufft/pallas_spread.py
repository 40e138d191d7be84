"""Pallas TPU spreading kernel (the NUFFT hot op).

XLA lowers scatter-add with duplicate indices to a sequential per-index
loop, which is catastrophic on TPU -- spreading is THE op that made the
reference depend on finufft's hand-written C++/OpenMP spreader
(ref /root/reference/src/fftvis/cpu/nufft.py). This kernel is the TPU-native
equivalent: one pass over the sources, each accumulating a dense ES-kernel
tap patch into a VMEM-resident fine grid.

Design (see /opt/skills/guides/pallas_guide.md): the grid lives fully in
VMEM as (nfy, 2C * nfx) float32 (re/im channel planes side by side on the
lane axis). Each source adds a rank-1 outer product

    psi_y(periodic row distance) (nfy, 1)  x  psi_x(periodic lane distance)
    * weight (1, 2C*nfx)

over the WHOLE grid: the ES kernel is identically zero outside its w-wide
support, so this is exact, handles both periodic wraps for free, and needs
no dynamic indexing at all (Mosaic's dynamic sublane slices require
alignments the spread pattern cannot guarantee). The cost per source is
(nfy * 2C * nfx / 1024) vector ops -- for the grid sizes this path accepts
(VMEM-resident), that is well below the HBM-bandwidth cost of any
scatter-based alternative.

Complex weights are shipped as stacked (re, im) planes: the kernel is pure
f32; complex recombination happens in XLA where it fuses away.
"""

from __future__ import annotations

import functools

import numpy as np

from .kernels import es_kernel_grid

# Keep the f32 re/im grid under this many bytes of VMEM (headroom for the
# coordinate/weight blocks and compiler temporaries).
VMEM_GRID_BUDGET = 8 * 1024 * 1024


def pallas_spread_fits(n_channels: int, nf: tuple, w: int) -> bool:
    """Whether the f32 re/im grid fits the VMEM budget (2D only)."""
    del w
    if len(nf) != 2:
        return False
    nfy, nfx = nf
    if nfy % 8 != 0:
        return False
    return nfy * 2 * n_channels * nfx * 4 <= VMEM_GRID_BUDGET


def spread_pallas_2d(u_list, weights, nf, w: int, beta: float, interpret: bool = False):
    """ES spreading of complex weights onto a 2D periodic grid via Pallas.

    Parameters
    ----------
    u_list
        [(n,), (n,)] grid coordinates (y, x) already wrapped into [0, nf_d).
    weights
        (C, n) complex strengths.
    nf
        (nfy, nfx) grid shape.
    w, beta
        ES kernel width / sharpness.
    interpret
        Run in the Pallas interpreter (for CPU tests of the TPU kernel).

    Returns
    -------
    (C, nfy, nfx) complex grid, identical (to f32 accuracy) to the XLA
    scatter implementation in transform._spread_scatter.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nfy, nfx = int(nf[0]), int(nf[1])
    C, n = weights.shape
    c2 = 2 * C
    uy = u_list[0].astype(jnp.float32)
    ux = u_list[1].astype(jnp.float32)
    vals = jnp.concatenate(
        [jnp.real(weights), jnp.imag(weights)], axis=0
    ).astype(jnp.float32)  # (2C, n)

    kern = functools.partial(
        _spread_kernel, n=n, w=w, beta=float(beta), nfy=nfy, nfx=nfx, c2=c2
    )

    flat = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nfy, c2 * nfx), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(uy, ux, vals)

    grid = flat.reshape(nfy, c2, nfx).transpose(1, 0, 2)
    return grid[:C] + 1j * grid[C:]


def _spread_kernel(uy_ref, ux_ref, val_ref, out_ref, *, n, w, beta, nfy, nfx, c2):
    import jax
    import jax.numpy as jnp

    out_ref[:] = jnp.zeros_like(out_ref)

    # Dense row/lane positions (lanes replicated per channel plane).
    lane_flat = jax.lax.broadcasted_iota(jnp.int32, (1, c2 * nfx), 1)
    lane = (lane_flat % nfx).astype(jnp.float32)  # (1, c2*nfx)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nfy, 1), 0).astype(jnp.float32)

    def body(j, _):
        uyj = uy_ref[j]
        uxj = ux_ref[j]

        # Periodic distances; psi is zero outside |d| <= w/2, so the dense
        # outer product is exactly the w x w tap patch with wraps included.
        dy = rows - uyj
        dy = dy - nfy * jnp.round(dy / nfy)
        ky = es_kernel_grid(dy, w, beta, xp=jnp)  # (nfy, 1)

        dx = lane - uxj
        dx = dx - nfx * jnp.round(dx / nfx)
        kx = es_kernel_grid(dx, w, beta, xp=jnp)  # (1, c2*nfx)

        # Per-channel weight expanded along its lane plane (broadcast only).
        vj = val_ref[:, j]
        vrow = jnp.broadcast_to(vj[:, None], (c2, nfx)).reshape(1, c2 * nfx)

        out_ref[:, :] = out_ref[:, :] + ky * (kx * vrow)
        return 0

    jax.lax.fori_loop(0, n, body, 0)
