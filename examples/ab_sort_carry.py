"""A/B the pallas spreader's payload ordering on hardware.

FFTVIS_SORT_CARRY=1 carries the packed (cell, frac, re, im) payload rows
through one multi-operand ``lax.sort`` keyed by tile id; the default
permutes them with a post-sort lane gather (``jnp.take``). Lane-wise
gathers were the hot op of long-observation type-3 programs in the
round-3 trace attribution, so this measures both orderings on the two
type-3 headline workloads (bench.py rows 3 and 6).

Run: ``python examples/ab_sort_carry.py`` (TPU; single tunnel client).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _device_compute_time  # noqa: E402
from fftvis_tpu.beams import GaussianBeam  # noqa: E402
from fftvis_tpu.beams.interface import (  # noqa: E402
    BeamInterface,
    prepare_beam_unpolarized,
)
from fftvis_tpu import TelescopeLocation  # noqa: E402
from fftvis_tpu.geometry import hex_array  # noqa: E402
from fftvis_tpu.tpu.engine import TPUSimulationEngine  # noqa: E402
from fftvis_tpu.utils.healpix import healpix_radec  # noqa: E402


def main():
    rng = np.random.default_rng(7)
    loc = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1073.0)
    ra, dec = healpix_radec(64)
    flux = rng.uniform(0.1, 1.0, (ra.size, 2))
    freqs = np.linspace(1.0e8, 1.2e8, 2)
    times = 2459863.2 + np.linspace(0.0, 0.02, 3)
    ants = hex_array(8)
    keys = list(ants.keys())
    bls = [(keys[i], keys[j]) for i in range(len(keys)) for j in range(i, len(keys))]
    b = prepare_beam_unpolarized(BeamInterface(GaussianBeam(diameter=14.0)))
    kw3 = dict(
        ants=ants, fluxes=flux, ra=ra, dec=dec, freqs=freqs, times=times,
        beam_list=[b], telescope_loc=loc, baselines=bls, polarized=False,
        precision=2, force_use_type3=True,
    )

    ra24, dec24 = healpix_radec(128)
    flux24 = rng.uniform(0.1, 1.0, (ra24.size, 2))
    times24 = 2459863.2 + np.linspace(0.0, 1.0, 24)
    kw24 = dict(
        ants=ants, fluxes=flux24, ra=ra24, dec=dec24, freqs=freqs,
        times=times24, beam_list=[b], telescope_loc=loc,
        polarized=False, precision=2,
    )

    for name, kw, engine_kw in (
        ("type3-forced", kw3, {"nufft_mode": "type3"}),
        ("24h-nside128", kw24, {}),
    ):
        res = {}
        for mode in ("0", "1"):
            os.environ["FFTVIS_SORT_CARRY"] = mode
            run, inputs = TPUSimulationEngine(**engine_kw).simulate(
                return_program=True, **kw
            )
            dev, _ = _device_compute_time(run, inputs, repeats=5, loops=8)
            res[mode] = dev
            print(f"[ab] {name} SORT_CARRY={mode}: device {dev*1e3:.2f} ms")
        print(
            f"[ab] {name}: carry/gather = {res['0']/res['1']:.3f}x "
            f"({res['0']*1e3:.2f} -> {res['1']*1e3:.2f} ms)"
        )
    os.environ.pop("FFTVIS_SORT_CARRY", None)


if __name__ == "__main__":
    main()
