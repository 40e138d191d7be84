"""Checkpoint/resume driver tests."""

import numpy as np
import pytest

from fftvis_tpu import TelescopeLocation, simulate_vis
from fftvis_tpu.beams import GaussianBeam
from fftvis_tpu.checkpoint import simulate_vis_checkpointed

LOC = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
JD0 = 2459863.2


def _kwargs():
    rng = np.random.default_rng(0)
    nsrc = 15
    return dict(
        ants={i: np.array([*rng.uniform(-40, 40, 2), 0.0]) for i in range(4)},
        fluxes=rng.uniform(0.1, 1, (nsrc, 3)),
        ra=rng.uniform(0, 2 * np.pi, nsrc),
        dec=np.clip(LOC.lat + rng.normal(0, 0.4, nsrc), -np.pi / 2, np.pi / 2),
        beam=GaussianBeam(diameter=10.0),
        telescope_loc=LOC,
        polarized=False,
    )


def test_blocks_match_monolithic(tmp_path):
    kw = _kwargs()
    freqs = np.linspace(1e8, 1.2e8, 3)
    times = JD0 + np.linspace(0, 0.02, 5)
    want = simulate_vis(freqs=freqs, times=times, **kw)
    got = simulate_vis_checkpointed(
        checkpoint_dir=str(tmp_path / "ck"),
        time_block=2,
        freq_block=2,
        freqs=freqs,
        times=times,
        **kw,
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12 * np.abs(want).max())


def test_pipeline_depth_matches_sequential(tmp_path):
    """pipeline_depth > 1 dispatches blocks as async futures; the
    assembled result, the on-disk blocks, and resumability must be
    identical to sequential execution."""
    kw = _kwargs()
    freqs = np.linspace(1e8, 1.2e8, 3)
    times = JD0 + np.linspace(0, 0.02, 5)
    seq = simulate_vis_checkpointed(
        checkpoint_dir=str(tmp_path / "seq"), time_block=2, freq_block=2,
        pipeline_depth=1, freqs=freqs, times=times, **kw,
    )
    pipe = simulate_vis_checkpointed(
        checkpoint_dir=str(tmp_path / "pipe"), time_block=2, freq_block=2,
        pipeline_depth=3, freqs=freqs, times=times, **kw,
    )
    np.testing.assert_allclose(pipe, seq, rtol=0, atol=0)
    # The pipelined run's checkpoints resume cleanly.
    again = simulate_vis_checkpointed(
        checkpoint_dir=str(tmp_path / "pipe"), time_block=2, freq_block=2,
        pipeline_depth=3, freqs=freqs, times=times, **kw,
    )
    np.testing.assert_allclose(again, seq, rtol=0, atol=0)


def test_resume_uses_checkpoints(tmp_path, monkeypatch):
    kw = _kwargs()
    freqs = np.linspace(1e8, 1.2e8, 2)
    times = JD0 + np.linspace(0, 0.02, 4)
    ckdir = str(tmp_path / "ck")
    first = simulate_vis_checkpointed(
        checkpoint_dir=ckdir, time_block=2, freqs=freqs, times=times, **kw
    )

    # A resumed run must not call simulate_vis at all.
    import fftvis_tpu.checkpoint as ck

    def boom(**_):
        raise AssertionError("resume should not recompute")

    monkeypatch.setattr("fftvis_tpu.wrapper.simulate_vis", boom)
    second = simulate_vis_checkpointed(
        checkpoint_dir=ckdir, time_block=2, freqs=freqs, times=times, **kw
    )
    np.testing.assert_array_equal(first, second)


def test_config_mismatch_raises(tmp_path):
    kw = _kwargs()
    freqs = np.linspace(1e8, 1.2e8, 2)
    times = JD0 + np.linspace(0, 0.02, 2)
    ckdir = str(tmp_path / "ck")
    simulate_vis_checkpointed(checkpoint_dir=ckdir, freqs=freqs, times=times, **kw)
    with pytest.raises(ValueError, match="different"):
        simulate_vis_checkpointed(
            checkpoint_dir=ckdir, time_block=1, freqs=freqs, times=times, **kw
        )


def test_content_change_rejects_stale_blocks(tmp_path):
    """Same shapes but different input VALUES must not reuse stale blocks."""
    kw = _kwargs()
    freqs = np.linspace(1e8, 1.2e8, 2)
    times = JD0 + np.linspace(0, 0.02, 2)
    ckdir = str(tmp_path / "ck")
    simulate_vis_checkpointed(checkpoint_dir=ckdir, freqs=freqs, times=times, **kw)

    for mutate in (
        lambda k: k.update(fluxes=k["fluxes"] * 2.0),
        lambda k: k.update(ra=(k["ra"] + 0.1) % (2 * np.pi)),
        lambda k: k.update(
            ants={a: p + np.array([1.0, 0, 0]) for a, p in k["ants"].items()}
        ),
        lambda k: k.update(beam=GaussianBeam(diameter=14.0)),
    ):
        kw2 = dict(_kwargs())
        mutate(kw2)
        with pytest.raises(ValueError, match="different"):
            simulate_vis_checkpointed(
                checkpoint_dir=ckdir, freqs=freqs, times=times, **kw2
            )

    # Different freq/time values (same counts) likewise.
    with pytest.raises(ValueError, match="different"):
        simulate_vis_checkpointed(
            checkpoint_dir=ckdir, freqs=freqs * 1.01, times=times, **_kwargs()
        )
    with pytest.raises(ValueError, match="different"):
        simulate_vis_checkpointed(
            checkpoint_dir=ckdir, freqs=freqs, times=times + 0.1, **_kwargs()
        )

    # overwrite=True recovers.
    out = simulate_vis_checkpointed(
        checkpoint_dir=ckdir, freqs=freqs, times=times, overwrite=True, **kw2
    )
    assert np.all(np.isfinite(out))


def test_checkpoint_with_mesh(tmp_path):
    """Checkpointed sweep over a device mesh (the pod-sweep pattern)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from fftvis_tpu.parallel.mesh import make_mesh

    kw = _kwargs()
    freqs = np.linspace(1e8, 1.2e8, 2)
    times = JD0 + np.linspace(0, 0.02, 4)
    want = simulate_vis(freqs=freqs, times=times, **kw)
    got = simulate_vis_checkpointed(
        checkpoint_dir=str(tmp_path / "ck"),
        time_block=2,
        freqs=freqs,
        times=times,
        mesh=make_mesh(time=2, source=2),
        **kw,
    )
    np.testing.assert_allclose(got, want, atol=1e-11 * np.abs(want).max(), rtol=0)


def test_checkpoint_rejects_changed_settings(tmp_path):
    """Result-affecting kwargs (spline order, coord method, ...) are part
    of the content hash: rerunning with different settings in the same dir
    must refuse rather than silently reuse stale blocks."""
    import numpy as np
    import pytest

    from fftvis_tpu import TelescopeLocation
    from fftvis_tpu.checkpoint import simulate_vis_checkpointed
    from fftvis_tpu.beams import GriddedBeam, GaussianBeam

    rng = np.random.default_rng(0)
    loc = TelescopeLocation(np.deg2rad(-30.7), np.deg2rad(21.4), 1000.0)
    freqs = np.array([1.0e8, 1.1e8])
    beam = GriddedBeam.from_function(
        GaussianBeam(diameter=12.0), n_az=72, n_za=37, freqs=freqs,
        za_max=np.pi / 2,
    )
    kw = dict(
        ants={i: np.array([*rng.uniform(-30, 30, 2), 0.0]) for i in range(3)},
        fluxes=rng.uniform(0.1, 1, (12, 2)),
        ra=rng.uniform(0, 2 * np.pi, 12),
        dec=np.clip(loc.lat + rng.normal(0, 0.3, 12), -np.pi / 2, np.pi / 2),
        freqs=freqs, times=2459863.2 + np.linspace(0, 0.01, 2),
        beam=beam, telescope_loc=loc, polarized=False, precision=2,
        checkpoint_dir=str(tmp_path), time_block=1,
    )
    simulate_vis_checkpointed(beam_spline_opts={"order": 1}, **kw)
    with pytest.raises(ValueError, match="different configuration"):
        simulate_vis_checkpointed(beam_spline_opts={"order": 3}, **kw)


def test_env_knobs_key_the_content_hash(tmp_path, monkeypatch):
    """Result-affecting env knobs (FFTVIS_BEAM_UPSAMPLE etc.) must not
    silently mix blocks computed under different interpolation semantics
    into one resumed cube."""
    kw = _kwargs()
    freqs = np.linspace(1e8, 1.2e8, 2)
    times = JD0 + np.linspace(0, 0.01, 2)
    ck = str(tmp_path / "ck")
    simulate_vis_checkpointed(
        checkpoint_dir=ck, freqs=freqs, times=times, precision=2, **kw
    )
    monkeypatch.setenv("FFTVIS_DS", "1")
    with pytest.raises(ValueError, match="different"):
        simulate_vis_checkpointed(
            checkpoint_dir=ck, freqs=freqs, times=times, precision=2, **kw
        )


def test_manifest_written_atomically(tmp_path):
    """The manifest is replaced via a temp file; no stale .tmp remains and
    the manifest parses after a full run."""
    import json
    import os

    kw = _kwargs()
    freqs = np.linspace(1e8, 1.2e8, 2)
    times = JD0 + np.linspace(0, 0.01, 2)
    ck = tmp_path / "ck"
    simulate_vis_checkpointed(
        checkpoint_dir=str(ck), freqs=freqs, times=times, precision=2,
        time_block=1, **kw
    )
    assert not os.path.exists(ck / "manifest.json.tmp")
    with open(ck / "manifest.json") as fh:
        manifest = json.load(fh)
    assert manifest["done"]
