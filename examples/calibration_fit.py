"""Gradient-based calibration with the differentiable simulator.

A capability the reference framework cannot offer (its hot path runs
through finufft C++ / Numba, opaque to autodiff): fit physical sky and
instrument parameters directly against measured visibilities with exact
reverse-mode gradients through the full pipeline.

Demo: (1) recover perturbed source fluxes from "observed" visibilities,
then (2) recover a perturbed per-antenna E-field beam table, both with
optax Adam on a jitted value_and_grad step.

Run:  python examples/calibration_fit.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-scale demo (7 antennas, 16 sources): pin the CPU backend so runs are
# deterministic. NOTE the env var alone does not stop a pre-registered TPU
# plugin from winning the default backend; the config update below is what
# makes it stick. Set FFTVIS_EXAMPLE_BACKEND=tpu to run on the chip.
_backend = os.environ.get("FFTVIS_EXAMPLE_BACKEND", "cpu")
os.environ.setdefault("JAX_PLATFORMS", _backend)

import numpy as np

import jax

jax.config.update("jax_platform_name", _backend)

import jax.numpy as jnp
import optax

from fftvis_tpu import TelescopeLocation, build_differentiable_sim
from fftvis_tpu.beams import GaussianBeam
from fftvis_tpu.beams.gridded import GriddedBeam


def fit(loss, params, lr=3e-2, steps=300, decay=None, label=""):
    step = jax.jit(jax.value_and_grad(loss))
    # decay: optionally halve the step size every `steps/6` iterations --
    # the beam fit oscillates around its minimum at a fixed lr, while the
    # flux fit's ill-conditioned directions need the lr held constant.
    sched = lr if decay is None else optax.exponential_decay(
        lr, max(1, steps // 6), decay
    )
    opt = optax.adam(sched)
    state = opt.init(params)
    l0 = None
    for i in range(steps):
        val, g = step(params)
        if l0 is None:
            l0 = float(val)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
        if i % 50 == 0 or i == steps - 1:
            print(f"  [{label}] step {i:4d}  loss {float(val):.3e} "
                  f"({float(val) / l0:.1e} of start)")
    return params


def main():
    rng = np.random.default_rng(0)
    loc = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
    nsrc, nant = 16, 7
    ants = {i: np.array([*rng.uniform(-150, 150, 2), 0.0]) for i in range(nant)}
    # Earth-rotation synthesis (8 samples over ~3.6 h) + two frequencies:
    # enough uv coverage that per-source fluxes are well conditioned, not
    # just the total. Sources are drawn near the zenith at the epoch -- a
    # source below the horizon at all times has an exactly-zero Jacobian
    # (correctly!), so its flux would be unrecoverable.
    freqs = np.linspace(1.0e8, 1.1e8, 2)
    times = 2459863.2 + np.linspace(0, 0.15, 8)
    from fftvis_tpu.coords.erfa_lite import earth_rotation_angle

    zen_ra = earth_rotation_angle(np.atleast_1d(times.mean()))[0] + loc.lon
    ra = (zen_ra + rng.normal(0, 0.2, nsrc)) % (2 * np.pi)
    dec = np.clip(loc.lat + rng.normal(0, 0.2, nsrc), -np.pi / 2, np.pi / 2)
    true_flux = rng.uniform(0.2, 1.0, (nsrc, freqs.size))

    # Two distinct per-antenna E-field beams on one az/za grid (polarized:
    # the visibility is bilinear in the tables -> well-conditioned fit).
    beams = [
        GriddedBeam.from_function(
            GaussianBeam(diameter=12.0 + i), n_az=91, n_za=46, freqs=tuple(freqs)
        )
        for i in range(2)
    ]
    kw = dict(
        ants=ants, fluxes=true_flux, ra=ra, dec=dec, freqs=freqs, times=times,
        beam=beams, beam_idx=np.arange(nant) % 2, telescope_loc=loc,
        polarized=True, precision=2,
    )
    sim_fn, params = build_differentiable_sim(
        differentiate_beam=True, differentiate_gains=True, **kw
    )
    # "Observed" visibilities (noise-free demo), materialized on the HOST
    # as (re, im) float planes: complex device buffers (and aliased views
    # of them, e.g. jnp.real's) cannot cross the host<->device boundary on
    # relayed TPU runtimes, so stack fresh real planes inside jit and
    # fetch those; the NumPy constant then embeds into the jitted loss
    # without a device fetch.
    planes = np.asarray(
        jax.jit(lambda p: jnp.stack([jnp.real(sim_fn(p)), jnp.imag(sim_fn(p))]))(
            params
        )
    )
    data = planes[0] + 1j * planes[1]

    # ---- 1. flux calibration ----
    # Only "fluxes" rides in the parameter dict here: sim_fn falls back to
    # the baked-in beam table when the key is absent, so the (known) beams
    # stay fixed and cannot absorb the flux error (flux x beam degeneracy).
    print(f"flux calibration ({nsrc} sources):")
    x0 = {
        "fluxes": jnp.asarray(
            true_flux * (1 + 0.4 * rng.standard_normal(true_flux.shape))
        ),
    }
    loss = lambda p: jnp.sum(jnp.abs(sim_fn(p) - data) ** 2)
    sol = fit(loss, x0, steps=600, label="flux")
    err = np.abs(np.asarray(sol["fluxes"]) - true_flux).max()
    print(f"  max |flux error| after fit: {err:.2e}\n")

    # ---- 2. beam calibration ----
    print("beam-table calibration (2 per-antenna E-field tables):")
    t_true = np.asarray(params["beam_table"])
    x0 = {
        "fluxes": params["fluxes"],
        "beam_table": jnp.asarray(
            t_true * (1 + 0.05 * rng.standard_normal(t_true.shape))
        ),
    }
    sol = fit(loss, x0, lr=1e-2, steps=400, decay=0.5, label="beam")
    # Evaluate under jit: eager complex ops don't dispatch on relayed TPUs.
    resid = float(jax.jit(loss)(sol))
    print(f"  final data residual: {resid:.3e}\n")

    # ---- 3. gain calibration ----
    # Per-antenna complex gains (diagonal Jones) -- the standard
    # direction-independent calibration. The observable combinations are
    # the products conj(g_i) g_j; one global phase is degenerate.
    print("gain calibration (7 antennas, per-feed complex gains):")
    g_true = np.asarray(params["gains"]).copy()
    g_true[0] += 0.15 * rng.standard_normal(g_true[0].shape)
    g_true[1] += 0.15 * rng.standard_normal(g_true[1].shape)
    planes = np.asarray(
        jax.jit(
            lambda p: jnp.stack([jnp.real(sim_fn(p)), jnp.imag(sim_fn(p))])
        )({**params, "gains": jnp.asarray(g_true)})
    )
    gdata = planes[0] + 1j * planes[1]
    gloss = lambda p: jnp.sum(
        jnp.abs(sim_fn({**params, "gains": p["gains"]}) - gdata) ** 2
    )
    sol = fit(gloss, {"gains": params["gains"]}, lr=2e-2, steps=400,
              label="gain")
    gc_t = g_true[0] + 1j * g_true[1]
    g_f = np.asarray(sol["gains"])  # fetch floats; complex math on host
    gc_f = g_f[0] + 1j * g_f[1]
    prod_err = np.abs(
        gc_f[:, None] * np.conj(gc_f[None, :])
        - gc_t[:, None] * np.conj(gc_t[None, :])
    ).max()
    print(f"  max |gain-product error| after fit: {prod_err:.2e}")

    # ---- 4. geometry calibration (direct front-end) ----
    # Antenna-position fitting. The NUFFT engine's grid layout is
    # host-planned from the geometry, so positions are static in
    # build_differentiable_sim; build_differentiable_direct_sim traces the
    # exact direct sum (the oracle's O(nsrc * nbl) math) end to end
    # instead, making source AND antenna positions differentiable. Here:
    # recover cm-scale antenna-position errors from visibility phases.
    from fftvis_tpu import build_differentiable_direct_sim

    print("antenna-position calibration (cm-scale perturbations):")
    # Geometry fits need sky leverage: with sources clustered near zenith
    # the position Jacobian has near-flat directions (a perfect data fit
    # can sit ~10 cm from the truth). A 0.6 rad source spread over a
    # 7.2 h arc leaves only the exact rigid-translation degeneracy
    # (Jacobian SVD: 3 zero singular values, next one ~0.2).
    times_g = 2459863.2 + np.linspace(0, 0.3, 12)
    zen_g = earth_rotation_angle(np.atleast_1d(times_g.mean()))[0] + loc.lon
    ra_g = (zen_g + rng.normal(0, 0.6, nsrc)) % (2 * np.pi)
    dec_g = np.clip(loc.lat + rng.normal(0, 0.6, nsrc), -np.pi / 2, np.pi / 2)
    dsim, dparams = build_differentiable_direct_sim(
        ants, true_flux, ra_g, dec_g, freqs, times_g,
        GaussianBeam(diameter=12.0), loc, polarized=False,
        differentiate_antpos=True,
    )
    planes = np.asarray(
        jax.jit(lambda p: jnp.stack([jnp.real(dsim(p)), jnp.imag(dsim(p))]))(
            dparams
        )
    )
    ddata = planes[0] + 1j * planes[1]
    true_pos = np.asarray(dparams["antpos"])
    # Fit ONLY the positions: the (known) fluxes stay pinned in the
    # closure, or the optimizer trades flux against geometry.
    x0 = {
        "antpos": jnp.asarray(true_pos + 0.03 * rng.standard_normal(true_pos.shape)),
    }
    dloss = lambda p: jnp.sum(
        jnp.abs(dsim({**dparams, "antpos": p["antpos"]}) - ddata) ** 2
    )
    sol = fit(dloss, x0, lr=3e-3, steps=400, label="antpos")
    # A rigid translation of the whole array is exactly degenerate
    # (baselines are differences), so score recovered BASELINE vectors.
    fit_pos = np.asarray(sol["antpos"])
    tb = true_pos[:, None, :] - true_pos[None, :, :]
    fb = fit_pos[:, None, :] - fit_pos[None, :, :]
    start_err = np.abs(
        (np.asarray(x0["antpos"]) - true_pos)[:, None, :]
        - (np.asarray(x0["antpos"]) - true_pos)[None, :, :]
    ).max()
    print(f"  max |baseline-vector error|: start {start_err * 1e3:.1f} mm "
          f"-> fit {np.abs(fb - tb).max() * 1e3:.3f} mm")


if __name__ == "__main__":
    main()
