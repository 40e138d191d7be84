"""CLI + logging/profiling utility smoke tests."""

import json
import logging

import numpy as np
import pytest

from fftvis_tpu.cli import build_parser, main
from fftvis_tpu.logutils import (
    device_memory,
    host_memory,
    human_readable_size,
    log_progress,
    memtrace,
    printmem,
)
from fftvis_tpu.profiling import timed


def test_human_readable_size():
    assert human_readable_size(512) == "512.00 B"
    assert human_readable_size(2048) == "2.00 KB"
    assert human_readable_size(3 * 1024**3, 1) == "3.0 GB"


def test_host_memory():
    mem = host_memory()
    assert mem.get("rss", 1) > 0 and mem.get("available", 1) > 0


def test_printmem_and_memtrace(caplog):
    with caplog.at_level(logging.INFO):
        printmem(msg="checkpoint")
        peak = memtrace(0, "trace")
    assert peak >= 0


def test_log_progress(caplog):
    import time

    with caplog.at_level(logging.INFO):
        now, label = log_progress(time.time() - 10, time.time() - 1, 5, 10)
    assert "5/10" in label and "eta" in label


def test_timed(caplog):
    with caplog.at_level(logging.INFO):
        with timed("block"):
            np.ones(10).sum()
    assert any("block" in r.message for r in caplog.records)


def test_parser_defaults():
    args = build_parser().parse_args(["run-profile"])
    assert args.backend == "tpu" and args.precision == 2


def test_cli_end_to_end(capsys):
    rc = main(
        [
            "run-profile",
            "--nants", "4",
            "--nsource", "20",
            "--ntimes", "2",
            "--nfreq", "1",
            "--backend", "cpu",
            "--repeats", "1",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(out)
    assert payload["vis_points_per_s"] > 0
    assert payload["output_shape"][0] == 1


def test_cli_pipelined_throughput(capsys):
    rc = main(
        [
            "run-profile",
            "--nants", "4",
            "--nsource", "20",
            "--ntimes", "2",
            "--nfreq", "1",
            "--backend", "cpu",
            "--repeats", "1",
            "--pipeline", "2",
        ]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["wall_pipelined_s"] > 0
    assert payload["vis_points_per_s_pipelined"] > 0


def test_cli_hera_gridded(capsys):
    rc = main(
        [
            "run-profile",
            "--hera", "2",
            "--nsource", "30",
            "--ntimes", "1",
            "--nfreq", "1",
            "--backend", "cpu",
            "--repeats", "1",
        ]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["vis_points"] > 0


def test_xla_trace_capture(tmp_path):
    from fftvis_tpu.profiling import xla_trace

    with xla_trace(str(tmp_path / "trace")):
        np.ones(8).sum()
    # jax writes a plugins/ or perfetto trace directory structure
    import os

    assert any(os.scandir(tmp_path / "trace"))


def test_xla_trace_noop():
    from fftvis_tpu.profiling import xla_trace

    with xla_trace(None):
        pass


def test_save_device_memory_profile(tmp_path):
    from fftvis_tpu.profiling import save_device_memory_profile

    path = str(tmp_path / "mem.prof")
    try:
        save_device_memory_profile(path)
    except Exception:
        pytest.skip("device memory profiling unsupported on this backend")
    import os

    assert os.path.exists(path)
