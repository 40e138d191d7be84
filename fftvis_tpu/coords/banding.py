"""Per-time horizon-band block skipping (host planner).

For long observations only ~half the (statically culled) catalog is above
the horizon at any one time, yet the engine's static-shape scan spreads
and beam-evaluates EVERY source block at every time step, relying on the
mask to zero the invisible half. The reference avoids that work by
dynamically compacting above-horizon sources per chunk (ref
cpu_simulate.py:940-945) -- impossible under jit's static shapes.

The TPU-shaped equivalent planned here:

1. reorder the catalog: always-visible sources first, then
   sometimes-visible sources sorted by (visibility duty cycle, RA).
   A source's visibility window is an LST interval centered on its RA
   (transit) with half-width set by its declination's rise hour angle;
   two sources share visible times when both the center (RA) and the
   width (duty cycle) are close, so quantile classes in duty cycle,
   RA-sorted within each class, cluster concurrently-visible sources
   into the same contiguous blocks. (RA alone fails on dec-mixed
   catalogs: near-circumpolar sources smear every RA block, measured
   97% block activity vs ~65% with duty classes.)
2. compute, exactly and on the host (float64, the same rotation chain the
   device uses, with a keep-side margin for aberration and fp32 jitter),
   which of the engine's fixed-size source blocks contain ANY visible
   source at each time;
3. emit a static (ntimes, K) table of active block indices (K = the
   maximum active count; shorter rows padded with weight 0), which the
   device consumes as a scan over K contiguous ``dynamic_slice`` blocks
   instead of all blocks.

Work per time drops from nblocks to K; the skipped work includes beam
interpolation and coherency formation, not just spreading. Shapes stay
static: K is a trace-time constant, the per-time indices are data.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)


def plan_horizon_bands(
    rot,
    block: int,
    nblocks: int,
    nsrc_pad: int,
    margin: float = 2e-3,
    min_saving: float = 0.15,
):
    """Plan per-time active source blocks; may reorder ``rot`` in place.

    Parameters
    ----------
    rot
        :class:`~fftvis_tpu.coords.rotation.SourceRotation` (already
        culled). Not mutated; the caller applies the returned permutation
        to ``rot.eq_vectors`` and the flux arrays (results are cacheable
        across simulate() sweeps, so application is the caller's step).
    block, nblocks, nsrc_pad
        The engine's static source blocking (local shard; banding is
        planned only for unsharded source axes).
    margin
        Keep-side zenith-cosine margin: a block counts as active when any
        of its sources rises above ``z > -margin`` (covers aberration
        <= 1e-4 and device-fp32 jitter; same semantics as
        ``cull_never_visible``).
    min_saving
        Return None (no banding) unless the REALIZED device saving
        ``1 - K / nblocks`` reaches this fraction: the static scan length
        is K = max-over-times active count, so the worst time sets the
        work, and the dynamic-slice scan has slightly worse locality than
        the static one -- tiny savings are not worth taking.

    Returns
    -------
    None, or ``(perm, active_idx, active_val)`` with ``perm`` an (nsrc,)
    permutation of the catalog, ``active_idx`` (ntimes, K) int32 and
    ``active_val`` (ntimes, K) float32 (0.0 marks padding rows).
    """
    nsrc = rot.nsrc
    ntimes = rot.ntimes
    if nsrc == 0 or ntimes < 2 or nblocks < 2:
        return None

    # Per-(time, source) visibility from the exact float64 zenith-cosine
    # chain. Threshold row by row: materializing the full (ntimes, nsrc)
    # float64 matrix costs 8x the bool table and can OOM exactly the
    # long-observation x large-catalog runs banding targets.
    vis = np.empty((ntimes, nsrc), dtype=bool)
    for t in range(ntimes):
        vis[t] = rot.topo_at(t)[2] > -margin

    always = vis.all(axis=0)
    some = ~always
    if not some.any():
        return None  # everything circumpolar: nothing to skip

    # Sort the sometimes-up set by (duty-cycle class, RA): see module
    # docstring. RA comes from the (culled) ICRS vectors; the duty cycle
    # is the exact fraction of simulated times the source is visible.
    eq = rot.eq_vectors
    ra = np.mod(np.arctan2(eq[1], eq[0]), 2 * np.pi)
    some_idx = np.flatnonzero(some)
    duty = vis[:, some_idx].mean(axis=0)
    n_classes = int(np.clip(nblocks // 8, 2, 16))
    # Quantile class edges keep classes equally populated.
    qs = np.quantile(duty, np.linspace(0, 1, n_classes + 1)[1:-1])
    cls = np.searchsorted(qs, duty, side="right")
    order = np.lexsort((ra[some_idx], cls))
    perm = np.concatenate([np.flatnonzero(always), some_idx[order]])

    visp = vis[:, perm]
    pad = nsrc_pad - nsrc
    if pad:
        visp = np.pad(visp, ((0, 0), (0, pad)))
    actb = visp.reshape(ntimes, nblocks, block).any(axis=2)  # (nt, nb)
    counts = actb.sum(axis=1)
    K = int(counts.max())
    saved = 1.0 - K / nblocks
    if K == 0 or saved < min_saving:
        return None

    active_idx = np.zeros((ntimes, K), dtype=np.int32)
    active_val = np.zeros((ntimes, K), dtype=np.float32)
    for t in range(ntimes):
        ids = np.flatnonzero(actb[t])
        active_idx[t, : ids.size] = ids
        active_val[t, : ids.size] = 1.0

    logger.info(
        "horizon banding: scanning %d of %d source blocks per time "
        "(%.0f%% of per-time block work skipped; worst time sets K) "
        "over %d times",
        K, nblocks, 100.0 * saved, ntimes,
    )
    return perm, active_idx, active_val
