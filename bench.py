"""Benchmark: gridded-array (type-1) visibility throughput.

Reproduces the reference's headline gridded workload (BASELINE.md: hera-like
hex_array(11, outriggers=2) ~320+ antennas, ALL baselines, 2 freqs x 3
times, nside=64 HEALPix sky = 49152 sources, unpolarized) and reports
visibility points per second:

    baseline (finufft CPU, author machine): ~51k bls * 2 * 3 / 0.482 s
                                            = 6.4e5 vis-points/s

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

BASELINE_VIS_POINTS_PER_S = 6.4e5


def main():
    import jax

    from fftvis_tpu import TelescopeLocation, simulate_vis
    from fftvis_tpu.beams import GaussianBeam
    from fftvis_tpu.geometry import hex_array
    from fftvis_tpu.utils.healpix import healpix_radec

    hex_size = int(os.environ.get("FFTVIS_BENCH_HEX", "11"))
    nside = int(os.environ.get("FFTVIS_BENCH_NSIDE", "64"))
    repeats = int(os.environ.get("FFTVIS_BENCH_REPEATS", "3"))

    ants = hex_array(hex_size, sep=14.6, outriggers=2)
    nant = len(ants)
    keys = list(ants.keys())
    baselines = [
        (keys[i], keys[j]) for i in range(nant) for j in range(i, nant)
    ]

    ra, dec = healpix_radec(nside)
    nsrc = ra.size
    freqs = np.array([1.0e8, 1.1e8])
    times = 2459863.2 + np.linspace(0, 0.01, 3)
    rng = np.random.default_rng(0)
    flux = rng.uniform(0.1, 1.0, (nsrc, freqs.size))
    loc = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)

    kw = dict(
        ants=ants,
        fluxes=flux,
        ra=ra,
        dec=dec,
        freqs=freqs,
        times=times,
        beam=GaussianBeam(diameter=14.0),
        telescope_loc=loc,
        baselines=baselines,
        polarized=False,
        precision=2,
        backend="tpu",
    )

    # Warm-up: trace + compile (cached afterwards).
    v = simulate_vis(**kw)
    assert np.all(np.isfinite(v)), "benchmark produced non-finite output"

    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        simulate_vis(**kw)
        best = min(best, time.perf_counter() - t0)

    vis_points = len(baselines) * freqs.size * times.size
    value = vis_points / best

    # Supplementary: device-side rate excluding the host<->device result
    # transfer (which dominates under relayed/tunneled runtimes). stderr
    # only -- stdout stays a single JSON line.
    try:
        import sys

        from fftvis_tpu.beams.interface import BeamInterface, prepare_beam_unpolarized
        from fftvis_tpu.tpu.engine import TPUSimulationEngine

        eng = TPUSimulationEngine()
        beam_list = [prepare_beam_unpolarized(BeamInterface(kw["beam"]))]
        ekw = {k: v2 for k, v2 in kw.items() if k not in ("beam", "backend")}
        run, inputs = eng.simulate(beam_list=beam_list, return_program=True, **ekw)
        jax.block_until_ready(run(*inputs))
        t0 = time.perf_counter()
        nrep = 5
        for _ in range(nrep):
            jax.block_until_ready(run(*inputs))
        dev_t = (time.perf_counter() - t0) / nrep
        print(
            f"[bench] device-only per-call: {dev_t * 1e3:.2f} ms "
            f"({vis_points / max(dev_t, 1e-9):.3e} vis_points/s); "
            f"wall per-call incl transfers: {best:.3f} s",
            file=sys.stderr,
        )
    except Exception as err:  # pragma: no cover
        print(f"[bench] device-only measurement skipped: {err}", file=sys.stderr)

    # Secondary reference headline (BASELINE.md "fftvis wall time, tutorial
    # sim": 3.32 s): hex array, 20 freqs x 30 times, nside=64, unpolarized.
    try:
        import sys

        from fftvis_tpu.beams import AiryBeam

        ants_t = hex_array(3, sep=14.6)
        freqs_t = np.linspace(1.0e8, 1.2e8, 20)
        times_t = 2459863.2 + np.linspace(0, 30 / 60 / 24, 30)
        flux_t = rng.lognormal(0, 0.5, nsrc)[:, None] * (freqs_t / 1e8) ** -2.7
        kw_t = dict(
            ants=ants_t, fluxes=flux_t, ra=ra, dec=dec, freqs=freqs_t,
            times=times_t, beam=AiryBeam(diameter=14.0), telescope_loc=loc,
            polarized=False, precision=2, backend="tpu",
        )
        vt = simulate_vis(**kw_t)
        best_t = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            simulate_vis(**kw_t)
            best_t = min(best_t, time.perf_counter() - t0)
        print(
            f"[bench] tutorial workload (hex {len(ants_t)} ants, 20f x 30t, "
            f"nside=64): wall {best_t:.3f} s vs reference fftvis-CPU 3.32 s "
            f"({3.32 / best_t:.1f}x) and matvis 19.5 s ({19.5 / best_t:.0f}x)",
            file=sys.stderr,
        )
    except Exception as err:  # pragma: no cover
        print(f"[bench] tutorial workload skipped: {err}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": (
                    f"gridded type-1 visibility throughput "
                    f"(hex{hex_size}+outriggers {nant} ants, {len(baselines)} bls, "
                    f"2 freqs x 3 times, nside={nside} sky = {nsrc} srcs, "
                    f"unpolarized, {jax.default_backend()})"
                ),
                "value": value,
                "unit": "vis_points/s",
                "vs_baseline": value / BASELINE_VIS_POINTS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
