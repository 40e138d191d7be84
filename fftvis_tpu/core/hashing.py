"""Content fingerprinting for host-side caches (plans, programs, beams)."""

from __future__ import annotations

import hashlib

import numpy as np


def hash_parts(parts) -> str:
    """SHA1 over a nested structure of scalars/strings/arrays/tuples/dicts."""
    h = hashlib.sha1()

    def feed(obj):
        if obj is None or isinstance(obj, (str, int, float, bool, bytes)):
            h.update(repr(obj).encode())
        elif isinstance(obj, np.ndarray):
            h.update(str(obj.dtype).encode())
            h.update(str(obj.shape).encode())
            h.update(np.ascontiguousarray(obj).tobytes())
        elif isinstance(obj, (tuple, list)):
            h.update(b"(")
            for item in obj:
                feed(item)
            h.update(b")")
        elif isinstance(obj, dict):
            for k in sorted(obj, key=repr):
                feed(k)
                feed(obj[k])
        else:
            h.update(repr(obj).encode())

    feed(parts)
    return h.hexdigest()


def beam_fingerprint(bi) -> tuple:
    """Static description of a beam object (any of this package's kinds)."""
    from ..beams.analytic import AnalyticBeam
    from ..beams.gridded import GriddedBeam
    from ..beams.interface import BeamInterface, PowerBeam

    if isinstance(bi, BeamInterface):
        return ("iface", bi.beam_type, beam_fingerprint(bi.beam))
    if isinstance(bi, PowerBeam):
        return ("power", bi.use_feed, beam_fingerprint(bi.base))
    if isinstance(bi, GriddedBeam):
        return (
            "grid",
            bi.beam_type,
            bi.data_array,
            bi.axis1_array,
            bi.axis2_array,
            bi.freq_array,
        )
    if isinstance(bi, AnalyticBeam):
        return (
            type(bi).__name__,
            tuple(
                sorted(
                    (k, v)
                    for k, v in vars(bi).items()
                    if isinstance(v, (int, float, str, bool, type(None)))
                )
            ),
        )
    return ("other", repr(bi))
