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

Not differentiable here (static planning inputs): antenna/source
positions, times, frequencies -- the NUFFT grid layout, bin sort, and
tile capacities are host-planned from them. For gradients w.r.t. the
GEOMETRY (source ra/dec and antenna ENU positions -- astrometric fitting
and array calibration), use :func:`build_differentiable_direct_sim`: it
traces the exact direct measurement equation end to end instead of the
NUFFT program, at the oracle's O(nsrc * nbl) cost. The double-single
exact path (explicit ``eps`` below the fp32 floor) is excluded from both:
its final combine runs on the host in float64.

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

__all__ = ["build_differentiable_sim", "build_differentiable_direct_sim"]


def _make_gain_applier(bl_index, flipped, polarized):
    """Closure applying per-antenna diagonal-Jones gains to a visibility
    array in the reference output layout.

    Engine convention (probed against phased per-antenna beams, and
    matching the reference's A_i^H C A_j + final feed swap,
    ref cpu/beams.py:147-180, cpu_simulate.py:298-300): output element
    ``[a, b]`` of baseline (i, j) is ``<conj(v_i^b) v_j^a>``, so gains
    enter as ``conj(g_i^b) g_j^a``. For baselines the beam-pair router
    FLIPPED, the engine (like the reference) conjugates without swapping
    feed axes, so there the factor is ``conj(g_i^a) g_j^b``.
    Unpolarized: ``conj(g_i) g_j`` either way.
    """
    import jax.numpy as jnp

    bl_index = np.asarray(bl_index)
    bl_ai = jnp.asarray(bl_index[:, 0])
    bl_aj = jnp.asarray(bl_index[:, 1])
    bl_flip = jnp.asarray(np.asarray(flipped))

    def _apply_gains(vis, gains):
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

    return _apply_gains


def _init_gains(nant, nfreqs, polarized):
    """Unity per-antenna gains in the (re, im)-stacked storage layout."""
    shape = (2, nant, nfreqs) + ((2,) if polarized else ())
    g0 = np.zeros(shape, dtype=np.float32)
    g0[0] = 1.0  # unity gains: re=1, im=0
    return g0


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
    _apply_gains = _make_gain_applier(
        info["bl_index"], info["flipped"], polarized
    )

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
        params["gains"] = jnp.asarray(_init_gains(len(ants), nfreqs, polarized))
    return sim_fn, params


def build_differentiable_direct_sim(
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
    beam_spline_opts: dict | None = None,
    use_feed: str = "x",
    interpolation_function: str = "az_za_map_coordinates",
    coord_method: str = "CoordinateRotationERFA",
    differentiate_positions: bool = False,
    differentiate_antpos: bool = False,
    differentiate_beam: bool = False,
    differentiate_gains: bool = False,
):
    """Build a direct-summation ``(sim_fn, params)`` differentiable in the
    GEOMETRY: source positions and antenna positions, on top of fluxes /
    beam tables / gains.

    :func:`build_differentiable_sim` wraps the NUFFT engine program, whose
    grid layout, bin sort and tile planning are host-side functions of the
    source and antenna positions -- so positions there are static. This
    front-end instead traces the exact direct measurement equation (the
    same one the in-repo oracle implements,
    :class:`fftvis_tpu.reference.direct_engine.DirectSimulationEngine`)

        V_(ij)(nu, t) = sum_s  transpose(A_i^H C A_j)
                        * exp(+2 pi i nu (r_j - r_i) . x_s(t) / c)

    end to end in JAX: ICRS unit vectors from (ra, dec), aberration +
    per-time rotation (host-planned matrices, position-independent), the
    horizon mask, beam interpolation at the rotated (az, za), coherency
    formation, and the fringe sum. Gradients w.r.t. ``ra``/``dec`` and the
    per-antenna ENU positions are exact (the fringe phase AND the
    beam-argument dependence both flow), enabling astrometric source
    fitting and array-geometry calibration -- capabilities outside the
    reference's reach (its finufft/Numba pipeline is opaque to autodiff).

    Cost is the oracle's O(nsrc * nbl) per (time, freq) -- this is a
    calibration/fitting tool, not the bulk simulator. Output matches
    ``simulate_vis``'s layout ``(nfreqs, ntimes[, 2, 2], nbls)`` and its
    values match :class:`DirectSimulationEngine` at the working precision.

    Parameters mirror :func:`simulate_vis` where they apply; eigenbeam
    ``beam_coefs`` are not supported here (use the engine-backed
    front-end). ``params`` holds ``"fluxes"`` always, plus ``"ra"``/
    ``"dec"`` (radians) when ``differentiate_positions``, ``"antpos"``
    (nant, 3 ENU meters, rows in ``list(ants)`` order) when
    ``differentiate_antpos``, ``"beam_table"`` when ``differentiate_beam``
    (>= 2 tabulated beams on one common grid -- the stacked-table input,
    as in :func:`build_differentiable_sim`), and ``"gains"`` when
    ``differentiate_gains``.

    Differentiability notes: the horizon mask (a source crossing
    za = pi/2) and the below-horizon (az, za) clamp are piecewise-constant
    selections -- gradients are exact wherever no source sits exactly on
    the horizon. Cubic (order-3) beam interpolation has a continuous first
    derivative; order-1 is piecewise-linear (gradients exist almost
    everywhere).
    """
    import jax
    import jax.numpy as jnp

    from .beams.interface import prepare_beams, stack_prepared
    from .coords.rotation import SourceRotation, enu_to_az_za
    from .core import utils as core_utils
    from .core.beams import plan_beam_pairs
    from .core.coherency import apparent_coherency_rows, classify_sky
    from .core.simulate import resolve_precision
    from .core.utils import speed_of_light

    ants = {k: np.asarray(v, dtype=float) for k, v in ants.items()}
    antnums = list(ants.keys())
    nant = len(antnums)
    freqs = np.atleast_1d(np.asarray(freqs, dtype=float))
    nfreqs = freqs.size
    rdtype, cdtype = resolve_precision(precision)

    beam_list, beam_idx = prepare_beam_list(
        beam, freqs, polarized, None, use_feed, nant, beam_idx
    )
    prepared = prepare_beams(
        beam_list, freqs, polarized,
        spline_opts=beam_spline_opts,
        interpolation_function=interpolation_function,
        use_feed=use_feed,
    )
    stacked = None
    if differentiate_beam:
        stacked = stack_prepared(prepared)
        if stacked is None:
            raise ValueError(
                "differentiate_beam=True requires at least two tabulated "
                "(gridded) beams sharing one az/za grid (the stacked-table "
                "input). Convert with GriddedBeam.from_function and pass a "
                "beam list with beam_idx."
            )

    if baselines is None:
        reds = core_utils.get_pos_reds(ants, include_autos=True)
        baselines = [red[0] for red in reds]
    nbl = len(baselines)
    nfeeds = 2 if polarized else 1

    ai_idx = np.array([antnums.index(b[0]) for b in baselines])
    aj_idx = np.array([antnums.index(b[1]) for b in baselines])
    antpos0 = np.array([ants[a] for a in antnums], dtype=float)  # (nant, 3)

    pair_plan = plan_beam_pairs(antnums, baselines, beam_idx)
    # Static column reordering: per-pair results concatenate along the
    # baseline axis in pair order; pos_of[b] is that concatenation's column
    # holding baseline b, so one static take restores baseline order.
    concat_order = np.concatenate([np.asarray(s) for s in pair_plan.bls_idxs])
    pos_of = np.empty(nbl, dtype=int)
    pos_of[concat_order] = np.arange(nbl)
    flipped_global = np.zeros(nbl, dtype=bool)
    for sel, fl in zip(pair_plan.bls_idxs, pair_plan.flipped):
        flipped_global[sel] = fl

    fluxes = np.asarray(fluxes, dtype=float)
    polarized_sky = classify_sky(fluxes, polarized)

    rot = SourceRotation(
        np.asarray(ra, dtype=float), np.asarray(dec, dtype=float), times,
        telescope_loc, coord_method=coord_method,
    )
    mats = rot.matrices.astype(rdtype)  # (nt, 3, 3) host constants
    vels = (
        np.zeros((rot.ntimes, 3), dtype=rdtype)
        if rot.aberration is None
        else rot.aberration.astype(rdtype)
    )
    ntimes = rot.ntimes

    ra0, dec0 = np.asarray(ra, dtype=float), np.asarray(dec, dtype=float)
    _apply_gains = _make_gain_applier(
        np.stack([ai_idx, aj_idx], axis=1), flipped_global, polarized
    )

    def _coherency(fl):
        """Traced Stokes -> coherency (mirror of build_coherency)."""
        if not polarized_sky:
            return (0.5 * fl).astype(rdtype)  # (nsrc, nfreq)
        I, Q, U, V = (fl[..., i] for i in range(4))
        re = 0.5 * jnp.stack(
            [jnp.stack([I + Q, U], -1), jnp.stack([U, I - Q], -1)], -2
        )
        im = 0.5 * jnp.stack(
            [
                jnp.stack([jnp.zeros_like(I), V], -1),
                jnp.stack([-V, jnp.zeros_like(I)], -1),
            ],
            -2,
        )
        return (re + 1j * im).astype(cdtype)  # (nsrc, nfreq, 2, 2)

    def sim_fn(params):
        antpos = jnp.asarray(
            params.get("antpos", antpos0), dtype=rdtype
        )  # (nant, 3)
        ra_t = jnp.asarray(params.get("ra", ra0), dtype=rdtype)
        dec_t = jnp.asarray(params.get("dec", dec0), dtype=rdtype)
        coh = _coherency(jnp.asarray(params["fluxes"]))
        table_in = (
            jnp.asarray(params["beam_table"]) if "beam_table" in params
            else None
        )

        cd = jnp.cos(dec_t)
        eq = jnp.stack(
            [cd * jnp.cos(ra_t), cd * jnp.sin(ra_t), jnp.sin(dec_t)], axis=0
        )  # (3, nsrc)
        blvec = (antpos[aj_idx] - antpos[ai_idx]).T  # (3, nbl)

        def one_time(_, mv):
            mat, vel = mv
            eqt = eq + vel[:, None]
            eqt = eqt / jnp.linalg.norm(eqt, axis=0, keepdims=True)
            topo = mat @ eqt  # (3, nsrc)
            up = (topo[2] > 0).astype(rdtype)
            az, za = enu_to_az_za(topo[0], topo[1], orientation="uvbeam")

            if table_in is not None:
                # One fused stacked-table interpolation; beam axis leads.
                def eval_all(fv, fi):
                    return stacked.evaluate_all(az, za, fv, fi, table_in)
            else:
                def eval_all(fv, fi):
                    return [pb.evaluate(az, za, fv, fi) for pb in prepared]

            vis_t = []
            for fi, freq in enumerate(freqs):
                evals = eval_all(freq, fi)
                phase = (2.0 * np.pi * freq / speed_of_light) * (
                    topo.T @ blvec
                )  # (nsrc, nbl) real
                fringe = jnp.exp(1j * phase.astype(rdtype)).astype(cdtype)
                flux_f = coh[:, fi]  # (nsrc[, 2, 2])
                flux_f = flux_f * (
                    up[:, None, None] if polarized_sky else up
                )
                parts = []
                for p, (bi, bj) in enumerate(pair_plan.pairs):
                    rows = apparent_coherency_rows(
                        evals[bi], evals[bj], flux_f, polarized, polarized_sky
                    ).astype(cdtype)  # (nfeeds^2, nsrc)
                    sel = np.asarray(pair_plan.bls_idxs[p])
                    flip = np.asarray(pair_plan.flipped[p])
                    fr = fringe[:, sel]  # static take
                    fr = jnp.where(flip[None, :], jnp.conj(fr), fr)
                    v = rows @ fr  # (nfeeds^2, nbl_p)
                    v = jnp.where(flip[None, :], jnp.conj(v), v)
                    v = v.reshape(nfeeds, nfeeds, -1)
                    # Reference's final feed transpose (ref :300).
                    parts.append(jnp.swapaxes(v, 0, 1))
                vis_f = jnp.concatenate(parts, axis=-1)[..., pos_of]
                vis_t.append(vis_f)
            return None, jnp.stack(vis_t)  # (nfreq, nf, nf, nbl)

        _, vis = jax.lax.scan(one_time, None, (jnp.asarray(mats), jnp.asarray(vels)))
        vis = jnp.transpose(vis, (1, 0, 2, 3, 4))  # (nfreq, nt, nf, nf, nbl)
        if not polarized:
            vis = vis[:, :, 0, 0, :]
        if "gains" in params:
            vis = _apply_gains(vis, jnp.asarray(params["gains"]))
        return vis

    params = {"fluxes": jnp.asarray(fluxes)}
    if differentiate_positions:
        params["ra"] = jnp.asarray(ra0)
        params["dec"] = jnp.asarray(dec0)
    if differentiate_antpos:
        params["antpos"] = jnp.asarray(antpos0)
    if differentiate_beam:
        params["beam_table"] = jnp.asarray(stacked.table)
    if differentiate_gains:
        params["gains"] = jnp.asarray(_init_gains(nant, nfreqs, polarized))
    return sim_fn, params
