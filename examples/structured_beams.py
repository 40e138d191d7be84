"""Per-antenna structured (CST-class) beams end to end.

Demonstrates the realistic-beam workflow the north-star benchmark row
scores: load the committed structured E-field beamfits asset through the
in-repo reader, derive genuinely distinct per-antenna variants, simulate
polarized visibilities on a HERA-class hex lattice, and cross-check a
subproblem against the exact fp64 direct-DFT oracle.

Run:  python examples/structured_beams.py  [--nants 37] [--nbeams 7]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fftvis_tpu import TelescopeLocation, simulate_vis
from fftvis_tpu.beams.interface import BeamInterface
from fftvis_tpu.beams.io import read_beamfits
from fftvis_tpu.beams.synth import perturbed_variants
from fftvis_tpu.geometry import hex_array
from fftvis_tpu.reference.direct_engine import DirectSimulationEngine
from fftvis_tpu.utils.healpix import healpix_radec

ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "structured_dipole_100MHz.beamfits",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hex", type=int, default=4, help="hex_array size")
    ap.add_argument("--nbeams", type=int, default=7)
    ap.add_argument("--nside", type=int, default=32)
    args = ap.parse_args()

    loc = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
    ants = hex_array(args.hex, sep=14.6)
    nant = len(ants)

    # The committed CST-class asset: Airy main lobe, 4 sidelobe rings and
    # deep nulls inside the horizon, complex cross-pol, az ripple.
    base = read_beamfits(ASSET)
    beams = perturbed_variants(base, min(args.nbeams, nant))
    beam_idx = np.arange(nant) % len(beams)
    print(f"{nant} antennas, {len(beams)} distinct structured beams "
          f"({base.data_array.shape[-2:]} za x az table)")

    ra, dec = healpix_radec(args.nside)
    rng = np.random.default_rng(0)
    flux = rng.uniform(0.1, 1.0, (ra.size, 1))
    kw = dict(
        ants=ants, fluxes=flux, ra=ra, dec=dec,
        freqs=np.array([1.0e8]),
        times=2459863.2 + np.linspace(0, 10 / 60 / 24, 4),
        beam=beams, beam_idx=beam_idx, telescope_loc=loc,
        polarized=True, precision=2,
    )
    t0 = time.perf_counter()
    vis = simulate_vis(**kw)
    print(f"first call (trace+compile): {time.perf_counter() - t0:.2f} s; "
          f"output {vis.shape}")
    t0 = time.perf_counter()
    vis = simulate_vis(**kw)
    print(f"steady call: {time.perf_counter() - t0:.3f} s")

    # Oracle cross-check on a 256-source subproblem.
    sel = rng.choice(ra.size, size=min(256, ra.size), replace=False)
    kw_sub = dict(kw)
    kw_sub.update(
        fluxes=flux[sel], ra=ra[sel], dec=dec[sel],
        times=kw["times"][:1],
    )
    got = simulate_vis(**kw_sub)
    beam_obj = kw_sub.pop("beam")
    want = DirectSimulationEngine().simulate(
        beam_list=[BeamInterface(b) for b in beam_obj], **kw_sub
    )
    rel = np.abs(got - want).max() / np.abs(want).max()
    print(f"subproblem vs fp64 direct oracle: {rel:.2e} max relative")


if __name__ == "__main__":
    main()
