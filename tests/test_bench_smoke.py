"""bench.py must stay runnable: it is the driver's scoring entry point.

Runs the full benchmark main() in-process at toy sizes (env knobs) on the
CPU test backend and validates the one-line JSON contract the driver
parses ({"metric", "value", "unit", "vs_baseline"}).
"""

import json

import numpy as np


def test_bench_main_smoke(monkeypatch, capsys):
    monkeypatch.setenv("FFTVIS_BENCH_HEX", "3")
    monkeypatch.setenv("FFTVIS_BENCH_NSIDE", "8")
    monkeypatch.setenv("FFTVIS_BENCH_REPEATS", "1")
    monkeypatch.setenv("FFTVIS_BENCH_HERA_HEX", "3")
    monkeypatch.setenv("FFTVIS_BENCH_NBEAMS", "4")
    import bench

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline", "rows"}
    assert payload["unit"] == "vis_points/s"
    assert np.isfinite(payload["value"]) and payload["value"] > 0
    assert np.isfinite(payload["vs_baseline"]) and payload["vs_baseline"] > 0
    assert "tutorial" in payload["metric"] or "headline" in payload["metric"]
    rows = payload["rows"]
    for required in ("tutorial", "gridded", "gridded_batched",
                     "noncoplanar_3d", "eigenbeam", "north_star",
                     "accuracy_probe"):
        assert required in rows, f"missing bench row {required}"
    assert rows["tutorial"]["ratio"] > 0
    assert rows["north_star"]["acc"] < 1e-5
    # The final line must stay comfortably inside the driver's output
    # tail window or "parsed" goes null again.
    assert len(out[-1]) < 1800, f"final JSON line too long: {len(out[-1])}"
