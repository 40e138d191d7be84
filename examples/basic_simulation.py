"""Basic visibility simulation (the reference's fftvis_tutorial workload).

A 15-antenna hex array observing an nside=64 HEALPix diffuse sky over
20 frequencies x 30 times, unpolarized -- the configuration behind
BASELINE.md's "fftvis wall time 3.32 s" tutorial number.

Run:  python examples/basic_simulation.py [--small]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

from fftvis_tpu import TelescopeLocation, simulate_vis
from fftvis_tpu.beams import AiryBeam
from fftvis_tpu.geometry import hex_array
from fftvis_tpu.utils.healpix import healpix_radec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="shrink for a quick demo")
    ap.add_argument("--backend", default="tpu")
    args = ap.parse_args()

    nside = 16 if args.small else 64
    nfreq = 3 if args.small else 20
    ntimes = 4 if args.small else 30

    ants = hex_array(3, sep=14.6)  # 19 antennas (hex_array(3))
    loc = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1050.0)
    ra, dec = healpix_radec(nside)
    freqs = np.linspace(1.0e8, 1.2e8, nfreq)
    rng = np.random.default_rng(42)
    # A toy diffuse sky: power-law spectra around 1 Jy.
    flux = rng.lognormal(0.0, 0.5, ra.size)[:, None] * (freqs / 1e8) ** -2.7
    times = 2459863.2 + np.linspace(0, 30 / 60 / 24, ntimes)  # 30 minutes

    t0 = time.perf_counter()
    vis = simulate_vis(
        ants=ants,
        fluxes=flux,
        ra=ra,
        dec=dec,
        freqs=freqs,
        times=times,
        beam=AiryBeam(diameter=14.0),
        telescope_loc=loc,
        polarized=False,
        precision=2,
        backend=args.backend,
    )
    wall = time.perf_counter() - t0
    print(f"vis shape {vis.shape} ({vis.dtype}), wall {wall:.2f} s")
    print(f"peak |V| = {np.abs(vis).max():.4f}")


if __name__ == "__main__":
    main()
