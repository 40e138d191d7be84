"""Pallas TPU spreading kernel (the NUFFT hot op).

XLA lowers scatter-add with duplicate indices to a sequential per-index
loop, which is catastrophic on TPU -- spreading is THE op that made the
reference depend on finufft's hand-written C++/OpenMP spreader
(ref /root/reference/src/fftvis/cpu/nufft.py). This kernel is the TPU-native
equivalent: one pass over the sources, each accumulating a dense
(w x nfx) ES-kernel tap patch into a VMEM-resident fine grid.

Design notes (see /opt/skills/guides/pallas_guide.md):

  * The grid lives fully in VMEM (channels x (nfy + w) x nfx, float32
    re/im planes). VMEM is ~16 MB; the planner picks this path only when
    the padded grid fits (typical type-1 grids are ~100-512 per side).
  * x-axis taps are a DENSE lane row: psi evaluated at the periodic lane
    distance to the source, so azimuth wrap costs nothing and no dynamic
    lane-offset slicing is needed (lane-dim dynamic slices relayout badly).
  * y-axis taps use a dynamic sublane slice of width w at ceil(u - w/2),
    on a grid padded by w rows; periodic wrap is restored by folding the
    pad rows back onto the top after the kernel (one cheap add).
  * Complex weights are shipped as stacked (re, im) channel planes: the
    kernel is pure f32, and complex recombination happens in XLA where it
    fuses away.
"""

from __future__ import annotations

import functools

import numpy as np

from .kernels import es_kernel_grid

# Keep the padded grid under this many bytes of VMEM (leave headroom for
# the weights block and double buffering).
VMEM_GRID_BUDGET = 8 * 1024 * 1024


def pallas_spread_fits(n_channels: int, nf: tuple, w: int) -> bool:
    """Whether the padded f32 re/im grid fits the VMEM budget (2D only)."""
    if len(nf) != 2:
        return False
    nfy, nfx = nf
    return 2 * n_channels * (nfy + w) * nfx * 4 <= VMEM_GRID_BUDGET


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
    (C, nfy, nfx) complex grid, identical (to fp accuracy) to the XLA
    scatter implementation in transform._spread_scatter.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nfy, nfx = int(nf[0]), int(nf[1])
    C, n = weights.shape
    uy = u_list[0].astype(jnp.float32)
    ux = u_list[1].astype(jnp.float32)
    vals = jnp.concatenate(
        [jnp.real(weights), jnp.imag(weights)], axis=0
    ).astype(jnp.float32)  # (2C, n)

    kern = functools.partial(
        _spread_kernel, n=n, w=w, beta=float(beta), nfy=nfy, nfx=nfx, c2=2 * C
    )

    padded = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2 * C, nfy + w, nfx), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(uy, ux, vals)

    # Fold the wrap pad rows back onto the grid top (periodic y).
    grid = padded[:, :nfy, :]
    grid = grid.at[:, :w, :].add(padded[:, nfy : nfy + w, :])
    out = grid[:C] + 1j * grid[C:]
    return out


def _spread_kernel(uy_ref, ux_ref, val_ref, out_ref, *, n, w, beta, nfy, nfx, c2):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    out_ref[:] = jnp.zeros_like(out_ref)

    # Dense lane positions for the x-axis taps.
    lane = jax.lax.broadcasted_iota(jnp.float32, (1, nfx), 1)  # (1, nfx)
    suby = jax.lax.broadcasted_iota(jnp.float32, (w, 1), 0)  # (w, 1)

    def body(j, _):
        uyj = uy_ref[j]
        uxj = ux_ref[j]

        # y taps: w rows starting at ceil(uy - w/2), on the padded grid
        # (wrap restored after the kernel). Offsets stay in (-w/2, w/2].
        iy0 = jnp.ceil(uyj - w / 2.0)
        ky = es_kernel_grid(uyj - (iy0 + suby), w, beta, xp=jnp)  # (w, 1)

        # x taps: periodic lane distance, dense across the row.
        dx = lane - uxj
        dx = dx - nfx * jnp.round(dx / nfx)
        kx = es_kernel_grid(dx, w, beta, xp=jnp)  # (1, nfx)

        patch = ky * kx  # (w, nfx)
        vj = val_ref[:, j]  # (2C,)
        contrib = vj[:, None, None] * patch[None, :, :]

        iy = iy0.astype(jnp.int32)
        # Map into the padded grid: rows in [0, nfy + w).
        iy = jnp.where(iy < 0, iy + nfy, iy)
        cur = out_ref[:, pl.ds(iy, w), :]
        out_ref[:, pl.ds(iy, w), :] = cur + contrib
        return 0

    jax.lax.fori_loop(0, n, body, 0)
