"""SPMD sharding tests on the 8-virtual-device CPU mesh.

Replaces the reference's "Ray remote result == direct in-process result"
contract (ref tests/test_cpu_simulate.py:1007-1115) with its SPMD analogue:
a mesh-sharded simulation must equal the single-device one exactly-ish.
"""

import numpy as np
import pytest

import jax

from fftvis_tpu import TelescopeLocation, simulate_vis
from fftvis_tpu.beams import GaussianBeam
from fftvis_tpu.geometry import hex_array
from fftvis_tpu.parallel.mesh import auto_mesh, make_mesh, simulate_vis_sharded

LOC = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
JD0 = 2459863.2

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _case(rng, nsrc=40, ntimes=3, polarized=False):
    ants = {i: np.array([*rng.uniform(-60, 60, 2), 0.0]) for i in range(6)}
    ra = rng.uniform(0, 2 * np.pi, nsrc)
    dec = np.clip(LOC.lat + rng.normal(0, 0.4, nsrc), -np.pi / 2, np.pi / 2)
    freqs = np.array([1.0e8, 1.1e8])
    flux = rng.uniform(0.1, 1.0, (nsrc, len(freqs)))
    times = JD0 + np.linspace(0, 0.03, ntimes)
    return dict(
        ants=ants, fluxes=flux, ra=ra, dec=dec, freqs=freqs, times=times,
        beam=GaussianBeam(diameter=10.0), telescope_loc=LOC,
        polarized=polarized, precision=2, force_use_type3=True,
    )


@pytest.mark.parametrize("tdev,sdev", [(4, 1), (1, 4), (2, 4), (4, 2)])
def test_sharded_matches_single_device(tdev, sdev):
    rng = np.random.default_rng(0)
    kw = _case(rng, ntimes=3, polarized=(tdev == 2))
    want = simulate_vis(backend="tpu", **kw)
    mesh = make_mesh(time=tdev, source=sdev)
    got = simulate_vis(backend="tpu", mesh=mesh, **kw)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-11 * scale, rtol=0)


def test_sharded_async_fetch_matches_sync():
    """async_fetch on a mesh-sharded sim: the future resolves to the same
    visibilities as the synchronous sharded call (the sharded output is a
    multi-shard jax.Array; copy_to_host_async is best-effort there)."""
    rng = np.random.default_rng(2)
    kw = _case(rng, ntimes=2)
    mesh = make_mesh(time=2, source=4)
    want = simulate_vis(backend="tpu", mesh=mesh, **kw)
    fut = simulate_vis(backend="tpu", mesh=mesh, async_fetch=True, **kw)
    np.testing.assert_allclose(fut.result(), want, rtol=0, atol=0)


def test_sharded_gridded_type1():
    rng = np.random.default_rng(1)
    kw = _case(rng, ntimes=2)
    kw["ants"] = hex_array(3)
    kw["force_use_type3"] = False
    want = simulate_vis(backend="tpu", **kw)
    got = simulate_vis_sharded(mesh=make_mesh(time=2, source=4), **kw)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-11 * scale, rtol=0)


def test_auto_mesh():
    m = auto_mesh(8)
    assert m.shape["time"] * m.shape["source"] == 8
    m2 = auto_mesh(8, prefer_time=False)
    assert m2.shape["time"] * m2.shape["source"] == 8


def test_mesh_too_big_raises():
    with pytest.raises(ValueError, match="exceeds"):
        make_mesh(time=64, source=64)


def test_sharded_multi_pair_direct():
    """Per-pair tuple scan carry under shard_map + psum."""
    rng = np.random.default_rng(2)
    kw = _case(rng, ntimes=2, polarized=True)
    kw["beam"] = [GaussianBeam(diameter=10.0), GaussianBeam(diameter=12.0)]
    kw["beam_idx"] = np.array([0, 1, 0, 1, 0, 1])
    want = simulate_vis(backend="tpu", **kw)
    got = simulate_vis(backend="tpu", mesh=make_mesh(time=2, source=2), **kw)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-11 * scale, rtol=0)


def test_nprocesses_maps_to_mesh():
    """The reference's nprocesses knob parallelizes times over devices."""
    rng = np.random.default_rng(3)
    kw = _case(rng, ntimes=4)
    a = simulate_vis(backend="tpu", nprocesses=1, **kw)
    b = simulate_vis(backend="tpu", nprocesses=4, **kw)
    np.testing.assert_allclose(b, a, atol=1e-11 * np.abs(a).max(), rtol=0)


def test_sharded_freq_axis():
    """Frequency-axis sharding, incl. gridded-beam global table indexing."""
    from fftvis_tpu.beams import GriddedBeam

    rng = np.random.default_rng(4)
    kw = _case(rng, ntimes=2)
    kw["freqs"] = np.linspace(1.0e8, 1.15e8, 4)
    kw["fluxes"] = rng.uniform(0.1, 1.0, (40, 4))
    # A tabulated beam makes per-frequency table indexing observable.
    kw["beam"] = GriddedBeam.from_function(
        GaussianBeam(diameter=8.0), n_az=60, n_za=61, freqs=(0.9e8, 1.3e8)
    )
    want = simulate_vis(backend="tpu", **kw)
    got = simulate_vis(
        backend="tpu", mesh=make_mesh(time=2, freq=2, source=2), **kw
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-11 * scale, rtol=0)


def test_sharded_freq_with_padding():
    """nfreq not divisible by the freq axis: padded channels sliced off."""
    rng = np.random.default_rng(5)
    kw = _case(rng, ntimes=2)
    kw["freqs"] = np.linspace(1.0e8, 1.1e8, 3)  # 3 freqs over 2 shards
    kw["fluxes"] = rng.uniform(0.1, 1.0, (40, 3))
    want = simulate_vis(backend="tpu", **kw)
    got = simulate_vis(backend="tpu", mesh=make_mesh(time=2, freq=2), **kw)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-11 * scale, rtol=0)


def test_sharded_ds_path_matches_single_device(monkeypatch):
    """The double-single direct path under a (time x source) mesh: DS
    accumulator tuples psum across source shards and the (2, 2, T, F, ...)
    output out_specs must replicate correctly."""
    monkeypatch.setenv("FFTVIS_DS", "1")
    rng = np.random.default_rng(17)
    kw = _case(rng, nsrc=40, ntimes=4)
    kw.pop("force_use_type3")
    want = simulate_vis(backend="tpu", **kw)
    got = simulate_vis(backend="tpu", mesh=make_mesh(time=2, source=2), **kw)
    assert got.dtype == np.complex128 and want.dtype == np.complex128
    np.testing.assert_allclose(got, want, atol=1e-9 * np.abs(want).max())


def test_auto_mesh_workload_aware():
    """With workload dims, auto_mesh delegates the axis split to the
    reference's freq x time partitioner (get_task_chunks as the mesh-shape
    chooser), with axes capped at the workload dimensions."""
    m = auto_mesh(8, ntimes=12, nfreqs=10)
    assert m.shape["time"] * m.shape["freq"] <= 8
    assert m.shape["time"] > 1  # 12 times across 8 devices splits time
    # Axes never exceed the workload dims (no identity-padded devices).
    m2 = auto_mesh(8, ntimes=3, nfreqs=6)
    assert m2.shape["time"] <= 3 and m2.shape["freq"] <= 6
    # Small workloads STILL shard over time (SPMD has no per-process
    # overhead; the partitioner's 2x-tasks rule must not disable devices).
    m3 = auto_mesh(8, ntimes=15, nfreqs=1)
    assert m3.shape["time"] == 8
    # Degenerate 1x1 workloads stay unsharded.
    m1 = auto_mesh(8, ntimes=1, nfreqs=1)
    assert m1.shape["time"] == 1 and m1.shape["freq"] == 1


def test_sharded_default_mesh_matches_single_device():
    rng = np.random.default_rng(29)
    kw = _case(rng, nsrc=30, ntimes=8)  # 8t x 2f: the default mesh shards
    m = auto_mesh(8, ntimes=8, nfreqs=2)
    assert m.devices.size > 1  # guard: the comparison is not vacuous
    want = simulate_vis(backend="tpu", **kw)
    got = simulate_vis_sharded(**kw)  # workload-aware default mesh
    np.testing.assert_allclose(got, want, atol=1e-10 * np.abs(want).max())
