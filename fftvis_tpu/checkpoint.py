"""Block-wise simulation driver with checkpoint/resume.

The reference runs each simulation to completion in one shot and has no
recovery story (SURVEY section 5: Ray OOMs abort the whole run). For
pod-scale sweeps (thousands of freqs x times) this module partitions the
(time x freq) grid into blocks, simulates block by block, persists each
finished block to disk, and resumes from whatever is already present.
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def simulate_vis_checkpointed(
    *,
    checkpoint_dir: str,
    time_block: int = 8,
    freq_block: int | None = None,
    overwrite: bool = False,
    pipeline_depth: int = 2,
    **kwargs,
) -> np.ndarray:
    """Run ``simulate_vis`` in (time, freq) blocks with on-disk checkpoints.

    Parameters
    ----------
    checkpoint_dir
        Directory for per-block ``.npy`` files and the manifest. A resumed
        call with the same configuration skips completed blocks.
    time_block, freq_block
        Block sizes along times / freqs (freq defaults to all freqs).
    overwrite
        Ignore existing checkpoints and recompute everything.
    pipeline_depth
        Number of blocks dispatched (``async_fetch=True``) before the
        oldest result is collected and checkpointed: each block's
        device-to-host transfer overlaps the next block's compute.
        Blocks are still saved in dispatch order, so resume semantics are
        unchanged; 1 restores fully sequential execution.
    kwargs
        Everything ``fftvis_tpu.simulate_vis`` accepts.

    Returns
    -------
    The assembled full visibility array, shaped exactly as simulate_vis
    would return.
    """
    from .coords.erfa_lite import TelescopeLocation, times_to_jd
    from .core.hashing import beam_fingerprint, hash_parts
    from .wrapper import simulate_vis

    freqs = np.atleast_1d(np.asarray(kwargs.pop("freqs"), dtype=float))
    times = times_to_jd(kwargs.pop("times"))
    nfreq, ntime = freqs.size, times.size
    freq_block = freq_block or nfreq

    os.makedirs(checkpoint_dir, exist_ok=True)
    manifest_path = os.path.join(checkpoint_dir, "manifest.json")

    # Content hash over every input that affects the visibilities: same-shape
    # but different-valued inputs must NOT silently reuse stale blocks.
    beams = kwargs.get("beam")
    beams = beams if isinstance(beams, list) else [beams]
    telescope_loc = TelescopeLocation.from_any(kwargs.get("telescope_loc"))
    content_hash = hash_parts(
        (
            freqs,
            times,
            np.asarray(kwargs["fluxes"], dtype=float),
            np.asarray(kwargs["ra"], dtype=float),
            np.asarray(kwargs["dec"], dtype=float),
            sorted(
                (repr(k), tuple(np.asarray(v, dtype=float)))
                for k, v in kwargs["ants"].items()
            ),
            [beam_fingerprint(b) for b in beams],
            None
            if kwargs.get("beam_idx") is None
            else np.asarray(kwargs["beam_idx"]),
            None
            if kwargs.get("beam_coefs") is None
            else np.asarray(kwargs["beam_coefs"]),
            None
            if kwargs.get("baselines") is None
            else [tuple(int(a) for a in b) for b in kwargs["baselines"]],
            repr(telescope_loc),
            bool(kwargs.get("polarized", False)),
            int(kwargs.get("precision", 2)),
            kwargs.get("eps"),
            # Remaining result-affecting knobs: changed settings must not
            # silently reuse blocks computed under the old ones.
            repr(kwargs.get("beam_spline_opts")),
            kwargs.get("interpolation_function", "az_za_map_coordinates"),
            kwargs.get("use_feed", "x"),
            kwargs.get("coord_method", "CoordinateRotationERFA"),
            repr(kwargs.get("coord_method_params")),
            repr(kwargs.get("upsample_factor")),
            bool(kwargs.get("force_use_type3", False)),
            float(kwargs.get("flat_array_tol", 1e-6)),
            # Result-affecting env knobs (they change interpolation or
            # contraction SEMANTICS, not just lowering): resumed blocks
            # must not mix accuracies with freshly computed ones.
            tuple(
                (k, os.environ.get(k, ""))
                for k in (
                    "FFTVIS_BEAM_UPSAMPLE",
                    "FFTVIS_ALLOW_BEAM_CLAMP",
                    "FFTVIS_MATMUL_PRECISION",
                    "FFTVIS_DS",
                    "FFTVIS_DS_COORDS",
                )
            ),
        )
    )

    config_key = {
        "nfreq": nfreq,
        "ntime": ntime,
        "time_block": time_block,
        "freq_block": freq_block,
        "polarized": bool(kwargs.get("polarized", False)),
        "nant": len(kwargs["ants"]),
        "nsrc": int(np.asarray(kwargs["fluxes"]).shape[0]),
        "content": content_hash,
    }
    if os.path.exists(manifest_path) and not overwrite:
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        if manifest.get("config") != config_key:
            raise ValueError(
                f"Checkpoint dir {checkpoint_dir} holds a different "
                f"configuration; pass overwrite=True to discard it."
            )
    else:
        manifest = {"config": config_key, "done": []}

    done = set(tuple(b) for b in manifest["done"])
    blocks = [
        (t0, min(t0 + time_block, ntime), f0, min(f0 + freq_block, nfreq))
        for t0 in range(0, ntime, time_block)
        for f0 in range(0, nfreq, freq_block)
    ]

    out = None
    kwargs.pop("async_fetch", None)  # pipelining is managed here
    pending: list = []  # (key, path, future) in dispatch order

    def _place(key, block):
        nonlocal out
        t0, t1, f0, f1 = key
        if out is None:
            shape = (nfreq, ntime) + block.shape[2:]
            out = np.zeros(shape, dtype=block.dtype)
        out[f0:f1, t0:t1] = block

    def _collect_oldest():
        key, path, fut = pending.pop(0)
        block = fut.result()
        np.save(path, block)
        manifest["done"] = [list(k) for k in sorted(done | {key})]
        # Atomic manifest update: a crash mid-write (the very event this
        # module exists to survive) must not leave a truncated JSON that
        # breaks the next resume.
        tmp_path = manifest_path + ".tmp"
        with open(tmp_path, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp_path, manifest_path)
        done.add(key)
        logger.info("checkpointed block %s -> %s", key, path)
        _place(key, block)

    for t0, t1, f0, f1 in blocks:
        key = (t0, t1, f0, f1)
        path = os.path.join(checkpoint_dir, f"block_t{t0}-{t1}_f{f0}-{f1}.npy")
        if key in done and os.path.exists(path) and not overwrite:
            _place(key, np.load(path))
            logger.info("resumed block %s from %s", key, path)
            continue
        # Slice every frequency-indexed input consistently.
        block_kwargs = dict(kwargs)
        block_kwargs["fluxes"] = np.asarray(kwargs["fluxes"])[:, f0:f1]
        if kwargs.get("beam_coefs") is not None:
            block_kwargs["beam_coefs"] = np.asarray(kwargs["beam_coefs"])[
                :, :, f0:f1
            ]
        pending.append((key, path, simulate_vis(
            freqs=freqs[f0:f1], times=times[t0:t1], async_fetch=True,
            **block_kwargs,
        )))
        while len(pending) >= max(int(pipeline_depth), 1):
            _collect_oldest()
    while pending:
        _collect_oldest()

    return out
