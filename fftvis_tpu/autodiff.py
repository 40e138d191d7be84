"""Differentiable visibility simulation (gradient-based calibration).

A capability the reference cannot offer: its hot path runs through finufft
C++ and Numba kernels, so visibilities are a black box to autodiff. Here
the whole simulation is one pure jitted XLA program
(:mod:`fftvis_tpu.tpu.engine`), so wrapping it as a JAX-traceable function
of the physical parameters gives exact reverse-mode gradients through the
full pipeline -- beam interpolation, coherency formation, NUFFT
spread/FFT/gather, pair routing -- at one extra program execution per
backward pass. This enables direct gradient-based fitting of source fluxes
(sky-model calibration) and tabulated per-antenna beam maps (beam
calibration) against measured visibilities, on TPU.

Usage::

    sim_fn, params = build_differentiable_sim(
        ants, fluxes, ra, dec, freqs, times, beam, telescope_loc,
        polarized=..., ...,
    )
    vis = sim_fn(params)                     # == simulate_vis(...) output

    def loss(p):
        r = sim_fn(p) - data
        return jnp.sum(jnp.abs(r) ** 2)

    g = jax.grad(loss)(params)               # d loss / d fluxes [, beam]
    step = jax.jit(jax.value_and_grad(loss))  # jit the whole fit step

Supported parameters: ``params["fluxes"]`` always (Stokes-I or IQUV, the
same array handed in); ``params["beam_table"]`` when
``differentiate_beam=True`` and the simulation uses two or more tabulated
beams sharing one az/za grid (the stacked table the engine interpolates
on device -- :func:`fftvis_tpu.beams.interface.stack_prepared`; this is
the per-antenna beam-calibration scenario); ``params["gains"]`` when
``differentiate_gains=True`` -- per-antenna direction-independent complex
gains (diagonal Jones), the standard radio-interferometric calibration
unknowns, applied in the engine's own convention
(``V_ij[a, b] = <conj(v_i^b) v_j^a>`` -> factor ``conj(g_i^b) g_j^a``,
feed axes unswapped on pair-flipped baselines -- see ``_apply_gains``),
so baking the gains into per-antenna beams and using ``params["gains"]``
are exactly equivalent.
Gains are stored as a real (re, im) leading axis -- shape
``(2, nant, nfreqs)`` unpolarized, ``(2, nant, nfreqs, 2 feeds)``
polarized, initialized to 1+0j -- because complex leaves neither cross
relayed host<->device boundaries nor fit optax updates cleanly.

Not differentiable (static planning inputs): antenna/source positions,
times, frequencies -- the NUFFT grid layout, bin sort, and tile capacities
are host-planned from them. The double-single exact path (explicit
``eps`` below the fp32 floor) is excluded: its final combine runs on the
host in float64.

Conditioning caveat for unpolarized beam fitting: the unpolarized path
weights sources by ``sqrt(B_i * B_j)`` (power-beam convention, ref
cpu_simulate.py:179-187), whose slope in the table entries is unbounded
where the power beam underflows toward zero -- gradients at far-tail
entries are locally exact but numerically explosive. Fit per-antenna
beams with ``polarized=True`` (E-field tables; the visibility is bilinear
in them and gradients are uniformly well-conditioned), or mask/regularize
tail entries in the unpolarized case.
"""

from __future__ import annotations

import numpy as np

from .wrapper import prepare_beam_list

__all__ = ["build_differentiable_sim"]


def build_differentiable_sim(
    ants: dict,
    fluxes: np.ndarray,
    ra: np.ndarray,
    dec: np.ndarray,
    freqs: np.ndarray,
    times,
    beam,
    telescope_loc,
    beam_idx: np.ndarray | None = None,
    baselines: list | None = None,
    precision: int = 2,
    polarized: bool = False,
    eps: float | None = None,
    upsample_factor=2,
    beam_spline_opts: dict | None = None,
    use_feed: str = "x",
    flat_array_tol: float = 1e-6,
    interpolation_function: str = "az_za_map_coordinates",
    coord_method: str = "CoordinateRotationERFA",
    coord_method_params: dict | None = None,
    force_use_type3: bool = False,
    beam_coefs: np.ndarray | None = None,
    mesh=None,
    differentiate_beam: bool = False,
    differentiate_gains: bool = False,
):
    """Build ``(sim_fn, params)``: a jit/grad-able simulation closure.

    Arguments mirror :func:`fftvis_tpu.simulate_vis` (same semantics and
    output shape/layout); ``sim_fn(params)`` returns the complex
    visibility array ``(nfreqs, ntimes[, 2, 2], nbls)`` as a traced JAX
    value, bit-matching ``simulate_vis`` on the same configuration.

    ``params`` is a dict of JAX arrays -- the initial point of a fit:
    ``{"fluxes": ...}`` plus ``{"beam_table": ...}`` when
    ``differentiate_beam=True``. ``sim_fn`` is a pure function of it
    (everything else is baked in), so it composes with ``jax.jit``,
    ``jax.grad``, ``jax.value_and_grad``, optax optimizers, and
    ``jax.vmap`` over parameter batches.
    """
    import jax.numpy as jnp

    from .tpu.engine import TPUSimulationEngine

    ants = {k: np.asarray(v) for k, v in ants.items()}
    freqs = np.atleast_1d(np.asarray(freqs, dtype=float))
    beam_list, beam_idx = prepare_beam_list(
        beam, freqs, polarized, beam_coefs, use_feed, len(ants), beam_idx
    )

    engine = TPUSimulationEngine(**({"mesh": mesh} if mesh is not None else {}))
    run, inputs, info = engine.simulate(
        ants=ants,
        freqs=freqs,
        fluxes=np.asarray(fluxes),
        beam_list=beam_list,
        beam_idx=beam_idx,
        ra=np.asarray(ra, dtype=float),
        dec=np.asarray(dec, dtype=float),
        times=times,
        telescope_loc=telescope_loc,
        baselines=baselines,
        precision=precision,
        polarized=polarized,
        eps=eps,
        upsample_factor=upsample_factor,
        beam_spline_opts=beam_spline_opts,
        flat_array_tol=flat_array_tol,
        interpolation_function=interpolation_function,
        coord_method=coord_method,
        coord_method_params=coord_method_params,
        force_use_type3=force_use_type3,
        beam_coefs=beam_coefs,
        return_program="full",
    )

    if info["use_ds"]:
        raise ValueError(
            "the double-single exact path (explicit eps below the fp32 "
            "floor) combines its output on the host in float64 and is not "
            "differentiable; use the default eps for this precision"
        )

    # Static (build-time) pieces of the fluxes -> device-coherency map.
    src_keep = info["src_keep"]
    keep_idx = None if src_keep is None else np.flatnonzero(src_keep)
    band_perm = info["band_perm"]
    polarized_sky = info["polarized_sky"]
    nsrc_pad, nf_pad = info["nsrc_pad"], info["nf_pad"]
    ntimes, nfreqs = info["ntimes"], info["nfreqs"]
    real_dtype = np.dtype(info["real_dtype"])
    # Real dtype of the complex shipping planes (float32 for complex64).
    plane_dtype = np.zeros(0, info["complex_dtype"]).real.dtype
    coh_i, tab_i = info["coh_index"], info["beam_table_index"]

    def _pad_to(arr, axis, size):
        pad = size - arr.shape[axis]
        if pad == 0:
            return arr
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, pad)
        return jnp.pad(arr, widths)

    def _coherency_ship(fl):
        """Traced mirror of the engine's host-side ``_build_coh``."""
        if keep_idx is not None:
            fl = fl[keep_idx]
        if band_perm is not None:
            fl = fl[band_perm]
        if polarized_sky:
            I, Q, U, V = (fl[..., i] for i in range(4))
            zero = jnp.zeros_like(I)
            re = 0.5 * jnp.stack(
                [jnp.stack([I + Q, U], -1), jnp.stack([U, I - Q], -1)], -2
            )
            im = 0.5 * jnp.stack(
                [jnp.stack([zero, V], -1), jnp.stack([-V, zero], -1)], -2
            )
            ch = jnp.stack([re, im]).astype(plane_dtype)  # (2, n, nf, 2, 2)
            ch = _pad_to(ch, 1, nsrc_pad)
            return _pad_to(ch, 2, nf_pad)
        ch = (0.5 * fl).astype(real_dtype)  # (n, nf)
        ch = _pad_to(ch, 0, nsrc_pad)
        return _pad_to(ch, 1, nf_pad)

    base_inputs = list(inputs)
    bl_ai = jnp.asarray(info["bl_index"][:, 0])
    bl_aj = jnp.asarray(info["bl_index"][:, 1])
    bl_flip = jnp.asarray(info["flipped"])

    def _apply_gains(vis, gains):
        """Apply per-antenna diagonal-Jones gains in the output layout.

        Engine convention (probed against phased per-antenna beams, and
        matching the reference's A_i^H C A_j + final feed swap,
        ref cpu/beams.py:147-180, cpu_simulate.py:298-300): output element
        ``[a, b]`` of baseline (i, j) is ``<conj(v_i^b) v_j^a>``, so gains
        enter as ``conj(g_i^b) g_j^a``. For baselines the beam-pair router
        FLIPPED, the engine (like the reference) conjugates without
        swapping feed axes, so there the factor is ``conj(g_i^a) g_j^b``.
        Unpolarized: ``conj(g_i) g_j`` either way.
        """
        gc = gains[0] + 1j * gains[1]  # (nant, nfreqs[, 2])
        gi, gj = jnp.conj(gc[bl_ai]), gc[bl_aj]  # (nbl, nfreqs[, 2])
        if polarized:
            # vis (nfreqs, ntimes, a, b, nbl).
            gi_f = jnp.transpose(gi, (1, 2, 0))  # (nfreqs, feed, nbl)
            gj_f = jnp.transpose(gj, (1, 2, 0))
            on_a = lambda g: g[:, None, :, None, :]
            on_b = lambda g: g[:, None, None, :, :]
            fac = jnp.where(
                bl_flip,
                on_a(gi_f) * on_b(gj_f),
                on_b(gi_f) * on_a(gj_f),
            )
            return vis * fac
        return vis * (gi * gj).T[:, None, :]  # (nfreqs, 1, nbl)

    def sim_fn(params):
        args = list(base_inputs)
        args[coh_i] = _coherency_ship(jnp.asarray(params["fluxes"]))
        if "beam_table" in params:
            args[tab_i] = jnp.asarray(params["beam_table"])
        stacked = run(*args)
        vis = (stacked[0] + 1j * stacked[1])[:ntimes, :nfreqs]
        # Reference output layout (ref cpu_simulate.py:849-854).
        vis = jnp.transpose(vis, (1, 0, 3, 4, 2))
        vis = vis if polarized else vis[:, :, 0, 0, :]
        if "gains" in params:
            vis = _apply_gains(vis, jnp.asarray(params["gains"]))
        return vis

    params = {"fluxes": jnp.asarray(np.asarray(fluxes, dtype=float))}
    if differentiate_beam:
        if not info["has_beam_table"]:
            raise ValueError(
                "differentiate_beam=True requires the engine's stacked "
                "beam-table input: at least two tabulated (gridded) beams "
                "sharing one az/za grid (the per-antenna calibration "
                "scenario). Analytic beams are closed-form, and a lone "
                "tabulated beam is baked in as a closure constant. Convert "
                "with GriddedBeam.from_function and pass a beam list with "
                "beam_idx."
            )
        params["beam_table"] = jnp.asarray(base_inputs[tab_i])
    if differentiate_gains:
        nant = len(ants)
        shape = (2, nant, nfreqs) + ((2,) if polarized else ())
        g0 = np.zeros(shape, dtype=np.float32)
        g0[0] = 1.0  # unity gains: re=1, im=0
        params["gains"] = jnp.asarray(g0)
    return sim_fn, params
