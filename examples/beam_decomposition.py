"""Eigenbeam decomposition (the reference's beam_decomposition tutorial):
N distinct per-antenna beams compressed into K eigenbeams, turning
O(N^2) beam-pair transforms into K(K+1)/2.

Run:  python examples/beam_decomposition.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from fftvis_tpu import TelescopeLocation, compute_beam_basis, simulate_vis
from fftvis_tpu.beams import GaussianBeam, GriddedBeam
from fftvis_tpu.geometry import hex_array


def main():
    nant = 7
    freq = 1.0e8
    loc = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1050.0)
    ants = hex_array(2, sep=20.0)  # 7 antennas
    rng = np.random.default_rng(0)

    # Per-antenna beams: slightly different dish sizes.
    diameters = 12.0 + rng.uniform(-1, 1, nant)
    ant_beams = [
        GriddedBeam.from_function(
            GaussianBeam(diameter=d), n_az=120, n_za=91, freqs=(freq,)
        )
        for d in diameters
    ]

    nsrc = 500
    ra = rng.uniform(0, 2 * np.pi, nsrc)
    dec = np.clip(loc.lat + rng.normal(0, 0.4, nsrc), -np.pi / 2, np.pi / 2)
    kw = dict(
        ants=ants,
        fluxes=rng.uniform(0.1, 1.0, (nsrc, 1)),
        ra=ra,
        dec=dec,
        freqs=np.array([freq]),
        times=2459863.2 + np.linspace(0, 0.01, 4),
        telescope_loc=loc,
        polarized=True,
        precision=2,
    )

    # Per-antenna path: one transform per unique beam pair.
    t0 = time.perf_counter()
    v_full = simulate_vis(beam=ant_beams, beam_idx=np.arange(nant), **kw)
    t_full = time.perf_counter() - t0

    # Eigenbeam path: SVD-compress, then K(K+1)/2 transforms.
    eig, coefs = compute_beam_basis(ant_beams, freq, polarized=True, threshold=1e-10)
    print(f"{nant} beams compressed to K={len(eig)} eigenbeams")
    t0 = time.perf_counter()
    v_basis = simulate_vis(beam=eig, beam_coefs=coefs[:, :, None], **kw)
    t_basis = time.perf_counter() - t0

    rel = np.abs(v_full - v_basis).max() / np.abs(v_full).max()
    print(f"per-antenna {t_full:.2f} s, eigenbeam {t_basis:.2f} s, agree to {rel:.2e}")


if __name__ == "__main__":
    main()
