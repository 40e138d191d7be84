"""Gridded-array (type-1) fast path (the reference's fftvis_gridded_array
tutorial): for lattice arrays ALL baselines come from one uniform FFT.

Run:  python examples/gridded_array.py [--hex 6]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

from fftvis_tpu import TelescopeLocation, simulate_vis
from fftvis_tpu.beams import GaussianBeam
from fftvis_tpu.geometry import hex_array
from fftvis_tpu.utils.healpix import healpix_radec


def run(force_type3: bool, **kw) -> tuple[np.ndarray, float]:
    t0 = time.perf_counter()
    vis = simulate_vis(force_use_type3=force_type3, **kw)
    return vis, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hex", type=int, default=6, help="hex size (11 = HERA-331 scale)")
    ap.add_argument("--nside", type=int, default=32)
    args = ap.parse_args()

    ants = hex_array(args.hex, sep=14.6, outriggers=2)
    keys = list(ants)
    baselines = [(keys[i], keys[j]) for i in range(len(keys)) for j in range(i, len(keys))]
    loc = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1050.0)
    ra, dec = healpix_radec(args.nside)
    rng = np.random.default_rng(0)
    freqs = np.array([1.0e8, 1.1e8])
    kw = dict(
        ants=ants,
        fluxes=rng.uniform(0.1, 1.0, (ra.size, 2)),
        ra=ra,
        dec=dec,
        freqs=freqs,
        times=2459863.2 + np.linspace(0, 0.01, 3),
        beam=GaussianBeam(diameter=14.0),
        telescope_loc=loc,
        baselines=baselines,
        polarized=False,
    )

    v1, t1 = run(False, **kw)  # auto-selects type-1 on the lattice
    v1b, t1b = run(False, **kw)  # cached program: steady-state timing
    print(f"{len(ants)} ants, {len(baselines)} baselines, {ra.size} sources")
    print(f"type-1 (gridded) first call {t1:.2f} s, steady {t1b:.3f} s")

    v3, t3 = run(True, **kw)
    v3b, t3b = run(True, **kw)
    rel = np.abs(v1 - v3).max() / np.abs(v1).max()
    print(f"type-3 forced: steady {t3b:.3f} s; paths agree to {rel:.2e}")


if __name__ == "__main__":
    main()
