"""Beam-file IO without pyuvdata: CST farfield text and beamfits.

The reference loads tabulated beams exclusively through pyuvdata:
``UVBeam.read_cst_beam`` on CST farfield text exports (ref
tests/test_wrapper.py:61-78 loads ``HERA_NicCST_150MHz.txt`` that way, with
``frequency=[150e6], feed_pol=["x"], x_orientation="east"``) and the
beamfits on-disk format pyuvdata defines for UVBeam. pyuvdata is a
host-side IO dependency in the reference stack (SURVEY section 2.4); this
module provides native numpy-only equivalents that produce
:class:`~fftvis_tpu.beams.gridded.GriddedBeam` objects directly, so users
with real beam files do not need pyuvdata installed to simulate with them.

Three entry points:

- :func:`read_cst` -- parse one or more CST farfield ASCII exports
  (``Theta  Phi  Abs(E)  Abs(Theta)  Phase(Theta)  Abs(Phi)  Phase(Phi)``
  columns, one file per frequency) into an efield or power GriddedBeam,
  including pyuvdata's ``rotate_pol`` convention (synthesize the second
  linear feed by rotating the measured one 90 degrees in azimuth).
- :func:`read_beamfits` -- read a (pyuvdata-style) beamfits file. The
  parser is a self-contained FITS reader (FITS is 2880-byte blocks of
  80-char header cards + big-endian data) and identifies axes by their
  ``CTYPE`` names (AZIMUTH / ZENANGLE / FREQ / FEEDIND / STOKES / IF /
  VECIND / COMPLEX), so any axis ordering a writer chose parses correctly.
- :func:`write_beamfits` -- emit a beamfits file for a GriddedBeam
  (round-trips through :func:`read_beamfits`; axis layout and keywords
  follow pyuvdata's documented beamfits conventions).

Everything here is host-side setup work (plain NumPy, no JAX).
"""

from __future__ import annotations

import os
import re

import numpy as np

from .gridded import GriddedBeam

__all__ = ["read_cst", "read_beamfits", "write_beamfits"]


# ======================================================================
# CST farfield text exports
# ======================================================================

# Column labels as pyuvdata's CST reader understands them, lowercased with
# whitespace stripped. Magnitudes may be labeled V (voltage) or E (field).
_CST_THETA = ("theta",)
_CST_PHI = ("phi",)
_CST_ABS_E = ("abs(e)", "abs(v)")
_CST_ABS_THETA = ("abs(theta)",)
_CST_PHASE_THETA = ("phase(theta)",)
_CST_ABS_PHI = ("abs(phi)",)
_CST_PHASE_PHI = ("phase(phi)",)


def _parse_cst_header(line: str) -> list[str]:
    """Split a CST header line into normalized column names.

    CST headers look like ``Theta [deg.]  Phi [deg.]  Abs(V   ) [ V/m ] ...``:
    each column is a name followed by a bracketed unit. Splitting on the
    closing bracket isolates one column per fragment.
    """
    names = []
    for frag in line.split("]")[:-1]:
        name = frag.split("[")[0]
        names.append(name.strip().lower().replace(" ", ""))
    return names


def _col(names: list[str], wanted: tuple, what: str, path: str) -> int:
    for i, n in enumerate(names):
        if n in wanted:
            return i
    raise ValueError(f"CST file {path!r} has no {what} column (header: {names})")


def _frequency_from_filename(path: str) -> float:
    """Parse a frequency from a CST filename (e.g. ``..._150MHz.txt``).

    Only the basename is searched: a frequency-like token in a parent
    directory (``/data/sims_2GHz/...``) must not shadow the filename's.
    """
    name = os.path.basename(path)
    m = re.search(r"(\d+(?:\.\d+)?)\s*([kMG]?Hz)", name, flags=re.IGNORECASE)
    if not m:
        raise ValueError(
            f"Cannot parse a frequency from filename {path!r}; pass "
            "frequencies= explicitly"
        )
    scale = {"hz": 1.0, "khz": 1e3, "mhz": 1e6, "ghz": 1e9}[m.group(2).lower()]
    return float(m.group(1)) * scale


def _read_cst_file(path: str, beam_type: str):
    """Read one CST export -> (az (naz,), za (nza,), fields dict of (nza, naz))."""
    rows = []
    with open(path) as fh:
        header = fh.readline()
        names = _parse_cst_header(header)
        for line in fh:
            s = line.strip()
            # Skip blanks, the dashed separator line under the header, and
            # comments. A plain comments="-" loadtxt would truncate data
            # lines at negative values (phases are routinely negative).
            if not s or s.startswith("#") or set(s) <= {"-", " "}:
                continue
            rows.append([float(tok) for tok in s.split()])
    if not rows or len({len(r) for r in rows}) != 1:
        raise ValueError(f"CST file {path!r}: ragged or empty data table")
    data = np.asarray(rows, dtype=float)
    if data.shape[1] < 2:
        raise ValueError(f"CST file {path!r}: unexpected data shape {data.shape}")

    it = _col(names, _CST_THETA, "Theta", path)
    ip = _col(names, _CST_PHI, "Phi", path)
    theta = np.deg2rad(data[:, it])
    phi = np.deg2rad(data[:, ip])

    za = np.unique(np.round(theta, 9))
    az = np.unique(np.round(phi, 9))
    # Drop a duplicated phi=360 column (some exports close the circle).
    full = az[np.abs(az - 2 * np.pi) > 1e-9]
    nza, naz = za.size, full.size
    if nza * az.size != data.shape[0]:
        raise ValueError(
            f"CST file {path!r}: {data.shape[0]} rows do not form a complete "
            f"{nza} x {az.size} (theta, phi) grid"
        )

    # Sort rows into (za, az) grid order regardless of file ordering.
    zi = np.searchsorted(za, np.round(theta, 9))
    ai = np.searchsorted(az, np.round(phi, 9))
    order = np.full(nza * az.size, -1, dtype=np.int64)
    order[zi * az.size + ai] = np.arange(data.shape[0])
    if np.any(order < 0):
        raise ValueError(f"CST file {path!r}: duplicate or missing grid rows")
    grid = data[order].reshape(nza, az.size, data.shape[1])[:, :naz]

    fields = {}
    if beam_type == "power":
        ie = _col(names, _CST_ABS_E, "Abs(E)/Abs(V)", path)
        fields["power"] = grid[..., ie] ** 2
    else:
        imt = _col(names, _CST_ABS_THETA, "Abs(Theta)", path)
        ipt = _col(names, _CST_PHASE_THETA, "Phase(Theta)", path)
        imp = _col(names, _CST_ABS_PHI, "Abs(Phi)", path)
        ipp = _col(names, _CST_PHASE_PHI, "Phase(Phi)", path)
        fields["e_theta"] = grid[..., imt] * np.exp(1j * np.deg2rad(grid[..., ipt]))
        fields["e_phi"] = grid[..., imp] * np.exp(1j * np.deg2rad(grid[..., ipp]))
    return full, za, fields


def read_cst(
    filenames,
    beam_type: str = "efield",
    frequencies=None,
    feed_pol: str = "x",
    rotate_pol: bool | None = None,
    x_orientation: str = "east",
) -> GriddedBeam:
    """Read CST farfield ASCII export(s) into a :class:`GriddedBeam`.

    Native equivalent of pyuvdata's ``UVBeam.read_cst_beam`` in the form the
    reference uses it (ref tests/test_wrapper.py:61-78): one text file per
    frequency, a single measured feed, and the second linear feed
    synthesized by rotating the measurement 90 degrees in azimuth
    (``rotate_pol``).

    Parameters
    ----------
    filenames
        One path or a list of paths, one file per frequency.
    beam_type
        "efield" (uses the Abs/Phase Theta and Phi columns) or "power"
        (uses the Abs(E)/Abs(V) column squared).
    frequencies
        Frequency in Hz per file. When omitted, parsed from each filename
        (e.g. ``HERA_NicCST_150MHz.txt`` -> 150e6).
    feed_pol
        The measured feed, "x" or "y" (pyuvdata labels; "x" is the east
        dipole under ``x_orientation="east"``).
    rotate_pol
        Synthesize the other linear feed by rolling the azimuth axis 90
        degrees. Defaults to True (pyuvdata's default for a single
        feed_pol); requires the az spacing to divide 90 degrees.
    x_orientation
        "east" (default) or "north": the sky direction of the 'x' feed,
        forwarded to the feed-ordering logic (a north-oriented x feed means
        label 'x' IS the north dipole).

    Returns
    -------
    GriddedBeam
        With UVBeam az/za conventions: axis1 = az = CST phi, axis2 = za =
        CST theta, efield vector components (az, za) = (E_phi, E_theta).
    """
    if beam_type not in ("efield", "power"):
        raise ValueError(f"beam_type must be 'efield' or 'power', got {beam_type!r}")
    if isinstance(filenames, (str, bytes)):
        filenames = [filenames]
    filenames = [str(f) for f in filenames]
    if frequencies is None:
        freqs = [_frequency_from_filename(f) for f in filenames]
    else:
        freqs = [float(f) for f in np.atleast_1d(frequencies)]
        if len(freqs) != len(filenames):
            raise ValueError(
                f"{len(filenames)} files but {len(freqs)} frequencies"
            )
    if rotate_pol is None:
        rotate_pol = True
    feed_pol = str(feed_pol).lower()
    if feed_pol not in ("x", "y"):
        raise ValueError(f"feed_pol must be 'x' or 'y', got {feed_pol!r}")

    order = np.argsort(freqs)
    az = za = None
    per_freq = []
    for k in order:
        a, z, fields = _read_cst_file(filenames[k], beam_type)
        if az is None:
            az, za = a, z
        elif (
            a.shape != az.shape
            or z.shape != za.shape
            or not (np.allclose(a, az) and np.allclose(z, za))
        ):
            raise ValueError(
                f"CST file {filenames[k]!r} is on a different (theta, phi) "
                "grid than the first file"
            )
        per_freq.append(fields)
    freq_array = np.asarray(freqs, dtype=float)[order]
    if np.any(np.diff(freq_array) <= 0):
        raise ValueError("Duplicate frequencies across CST files")

    naz, nza, nf = az.size, za.size, len(per_freq)
    if rotate_pol:
        # The synthesized feed is the measured pattern rolled 90 degrees
        # in azimuth, which is only meaningful when the phi axis is
        # uniform AND covers the full circle (np.roll wraps periodically).
        if naz < 2:
            raise ValueError("rotate_pol requires an azimuth axis")
        dazs = np.diff(az)
        daz = float(dazs[0])
        if not np.allclose(dazs, daz, rtol=1e-6, atol=1e-9):
            raise ValueError("rotate_pol requires uniform CST phi spacing")
        if abs(naz * daz - 2 * np.pi) > 1e-6 * 2 * np.pi:
            raise ValueError(
                "rotate_pol requires full-circle phi coverage (naz * dphi "
                f"= 360 deg); these files span {np.rad2deg(naz * daz):.2f} "
                "deg"
            )
        shift_f = (np.pi / 2) / daz
        shift = int(round(shift_f))
        if abs(shift_f - shift) > 1e-6:
            raise ValueError(
                "rotate_pol requires the CST phi spacing to divide 90 "
                f"degrees (got {np.rad2deg(daz):.4f} deg)"
            )

    def _stack(key, dtype):
        return np.stack([pf[key] for pf in per_freq]).astype(dtype)  # (nf, nza, naz)

    if beam_type == "power":
        p = _stack("power", np.float64)
        data = p[None, None]  # (1, 1, nf, nza, naz)
        if rotate_pol:
            # The rotated feed's power map: the measured pattern rolled 90
            # degrees in azimuth (a roll toward smaller az indices moves the
            # pattern of a feed rotated +90 deg into frame).
            data = np.concatenate([data, np.roll(data, shift, axis=-1)], axis=1)
        feeds = [feed_pol] + (["y" if feed_pol == "x" else "x"] if rotate_pol else [])
    else:
        e_phi = _stack("e_phi", np.complex128)
        e_theta = _stack("e_theta", np.complex128)
        # UVBeam vector axis: component 0 = azimuth (CST E_phi),
        # component 1 = zenith angle (CST E_theta).
        one = np.stack([e_phi, e_theta])[:, None]  # (2, 1, nf, nza, naz)
        if rotate_pol:
            other = np.roll(one, shift, axis=-1)
            data = np.concatenate([one, other], axis=1)
            feeds = [feed_pol, "y" if feed_pol == "x" else "x"]
        else:
            data = one
            feeds = [feed_pol]

    # Route through the UVBeam-adapter so feed ordering / x_orientation
    # semantics live in exactly one place (gridded.py from_uvbeam).
    ns = _Namespace(
        data_array=data,
        axis1_array=az,
        axis2_array=za,
        freq_array=freq_array,
        beam_type=beam_type,
        feed_array=np.asarray(feeds),
        x_orientation=x_orientation,
        pixel_coordinate_system="az_za",
    )
    return GriddedBeam.from_uvbeam(ns)


class _Namespace:
    def __init__(self, **kw):
        self.__dict__.update(kw)


# ======================================================================
# Minimal FITS layer (read + write, image HDUs only)
# ======================================================================

_FITS_BLOCK = 2880
_BITPIX_DTYPE = {
    8: ">u1",
    16: ">i2",
    32: ">i4",
    64: ">i8",
    -32: ">f4",
    -64: ">f8",
}


def _parse_card(card: str):
    """Parse one 80-char header card -> (keyword, value) or None."""
    key = card[:8].strip()
    if not key or key in ("COMMENT", "HISTORY"):
        return None
    if card[8:10] != "= ":
        return (key, None) if key == "END" else None
    body = card[10:]
    # Strip inline comment (a '/' outside a quoted string).
    if body.lstrip().startswith("'"):
        # String value: quotes with '' escaping.
        s = body.lstrip()
        out, i = [], 1
        while i < len(s):
            if s[i] == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                break
            out.append(s[i])
            i += 1
        return key, "".join(out).rstrip()
    if "/" in body:
        body = body.split("/", 1)[0]
    v = body.strip()
    if v in ("T", "F"):
        return key, v == "T"
    if not v:
        return key, None
    try:
        return key, int(v)
    except ValueError:
        pass
    try:
        return key, float(v.replace("D", "E").replace("d", "e"))
    except ValueError:
        return key, v


def _read_hdus(path: str):
    """Read all image HDUs of a FITS file -> list of (header dict, ndarray)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    hdus = []
    pos = 0
    while pos < len(buf):
        header = {}
        end = False
        hstart = pos
        while not end:
            if pos + _FITS_BLOCK > len(buf):
                if hdus and pos == hstart and not buf[pos:].strip(b"\x00 "):
                    return hdus  # trailing padding
                raise ValueError(f"Truncated FITS header in {path!r}")
            block = buf[pos : pos + _FITS_BLOCK].decode("ascii", errors="replace")
            pos += _FITS_BLOCK
            for ci in range(0, _FITS_BLOCK, 80):
                card = block[ci : ci + 80]
                if card[:3] == "END" and card[3:8].strip() == "":
                    end = True
                    break
                kv = _parse_card(card)
                if kv:
                    header[kv[0]] = kv[1]
        naxis = int(header.get("NAXIS", 0))
        shape_fits = [int(header[f"NAXIS{i}"]) for i in range(1, naxis + 1)]
        nelem = int(np.prod(shape_fits)) if shape_fits else 0
        bitpix = int(header["BITPIX"])
        dtype = np.dtype(_BITPIX_DTYPE[bitpix])
        nbytes = nelem * dtype.itemsize
        data = None
        if nelem:
            raw = buf[pos : pos + nbytes]
            if len(raw) < nbytes:
                raise ValueError(f"Truncated FITS data in {path!r}")
            data = np.frombuffer(raw, dtype=dtype).reshape(shape_fits[::-1])
            bscale = header.get("BSCALE", 1.0)
            bzero = header.get("BZERO", 0.0)
            if bscale != 1.0 or bzero != 0.0:
                data = data * bscale + bzero
            else:
                data = data.astype(dtype.newbyteorder("="))
            pos += -(-nbytes // _FITS_BLOCK) * _FITS_BLOCK
        hdus.append((header, data))
        # Stop at trailing zero padding.
        if pos >= len(buf) or not buf[pos:].strip(b"\x00 "):
            break
    return hdus


def _format_card(key: str, value, comment: str = "") -> bytes:
    if value is None:
        card = f"{key:<80}"
    elif isinstance(value, bool):
        card = f"{key:<8}= {'T' if value else 'F':>20}"
    elif isinstance(value, (int, np.integer)):
        card = f"{key:<8}= {value:>20d}"
    elif isinstance(value, (float, np.floating)):
        card = f"{key:<8}= {value:>20.16G}"
    else:
        s = str(value).replace("'", "''")
        card = f"{key:<8}= '{s:<8}'"
    if comment:
        card += f" / {comment}"
    return card[:80].ljust(80).encode("ascii")


def _write_hdus(path: str, hdus):
    """Write image HDUs: list of (cards list[(key, value[, comment])], ndarray|None)."""
    out = bytearray()
    for hdu_i, (cards, data) in enumerate(hdus):
        hdr = bytearray()
        base = []
        if hdu_i == 0:
            base.append(("SIMPLE", True, "conforms to FITS standard"))
        else:
            base.append(("XTENSION", "IMAGE", "Image extension"))
        if data is None:
            base += [("BITPIX", 8), ("NAXIS", 0)]
        else:
            data = np.ascontiguousarray(data)
            if data.dtype.kind == "f":
                fits_dtype = np.dtype(">f8") if data.dtype.itemsize == 8 else np.dtype(">f4")
                bitpix = -64 if data.dtype.itemsize == 8 else -32
            elif data.dtype.kind in "iu":
                fits_dtype, bitpix = np.dtype(">i8"), 64
            else:
                raise ValueError(f"Unsupported FITS data dtype {data.dtype}")
            base.append(("BITPIX", bitpix))
            base.append(("NAXIS", data.ndim))
            for i, n in enumerate(reversed(data.shape)):
                base.append((f"NAXIS{i + 1}", int(n)))
        if hdu_i == 0:
            base.append(("EXTEND", True))
        else:
            base += [("PCOUNT", 0), ("GCOUNT", 1)]
        for c in base + list(cards):
            hdr += _format_card(*c)
        hdr += b"END".ljust(80)
        pad = (-len(hdr)) % _FITS_BLOCK
        hdr += b" " * pad
        out += hdr
        if data is not None:
            raw = data.astype(fits_dtype).tobytes()
            out += raw
            out += b"\x00" * ((-len(raw)) % _FITS_BLOCK)
    with open(path, "wb") as fh:
        fh.write(bytes(out))


# ======================================================================
# beamfits
# ======================================================================

# CTYPE spellings accepted for each logical axis (pyuvdata's names first).
_AXIS_NAMES = {
    "az": ("AZIMUTH",),
    "za": ("ZENANGLE", "ZENITH"),
    "freq": ("FREQ",),
    "feed": ("FEEDIND", "STOKES", "POLIND"),
    "spw": ("IF", "SPWIND", "SPW"),
    "vec": ("VECIND",),
    "complex": ("COMPLEX",),
}


def _axis_values(header: dict, ax: int, n: int) -> np.ndarray:
    crval = float(header.get(f"CRVAL{ax}", 0.0))
    cdelt = float(header.get(f"CDELT{ax}", 1.0))
    crpix = float(header.get(f"CRPIX{ax}", 1.0))
    return crval + cdelt * (np.arange(n) + 1.0 - crpix)


def read_beamfits(path: str) -> GriddedBeam:
    """Read a (pyuvdata-style) beamfits file into a :class:`GriddedBeam`.

    Axes are identified by their ``CTYPE`` names rather than by position,
    so files written by pyuvdata (any version's axis ordering) and by
    :func:`write_beamfits` both parse. Requirements: an az_za coordinate
    system on a regular grid (the only layout beamfits can represent), and,
    when a BASISVEC extension is present, the standard az/za unit basis
    (a rotated basis would silently mix the E-field vector components —
    same check as ``GriddedBeam.from_uvbeam``).
    """
    hdus = _read_hdus(path)
    header, data = hdus[0]
    if data is None:
        raise ValueError(f"{path!r}: primary HDU has no data")
    coordsys = str(header.get("COORDSYS", "az_za")).strip().lower()
    if coordsys != "az_za":
        raise ValueError(
            f"Only az_za beamfits files are supported (got {coordsys!r})"
        )
    beam_type = str(
        header.get("BTYPE", header.get("BEAMTYPE", "efield"))
    ).strip().lower()
    if beam_type not in ("efield", "power"):
        raise ValueError(f"Unrecognized beamfits beam type {beam_type!r}")

    naxis = int(header["NAXIS"])
    roles = {}
    for ax in range(1, naxis + 1):
        ctype = str(header.get(f"CTYPE{ax}", "")).strip().upper()
        for role, names in _AXIS_NAMES.items():
            if ctype in names:
                roles[role] = ax
                break
        else:
            raise ValueError(f"{path!r}: unrecognized CTYPE{ax} = {ctype!r}")
    for req in ("az", "za", "freq"):
        if req not in roles:
            raise ValueError(f"{path!r}: missing {req} axis (CTYPEn)")

    # numpy axis for FITS axis ax is (naxis - ax); lay out as
    # (complex, vec, spw, feed, freq, za, az), synthesizing missing
    # singleton axes.
    order_roles = ["complex", "vec", "spw", "feed", "freq", "za", "az"]
    perm, missing = [], []
    for i, role in enumerate(order_roles):
        if role in roles:
            perm.append(naxis - roles[role])
        else:
            missing.append(i)
    arr = np.transpose(data, perm)
    for i in missing:
        arr = np.expand_dims(arr, i)

    ncplx = arr.shape[0]
    if beam_type == "efield":
        if ncplx != 2:
            raise ValueError(
                f"{path!r}: efield beamfits needs a length-2 COMPLEX axis"
            )
        arr = arr[0] + 1j * arr[1]
    else:
        if ncplx != 1:
            raise ValueError(f"{path!r}: power beamfits has a COMPLEX axis")
        arr = arr[0]
    if arr.shape[1] != 1:
        raise ValueError(f"{path!r}: multiple spectral windows not supported")
    arr = arr[:, 0]  # (vec, feed, freq, za, az)

    def _vals(role):
        ax = roles[role]
        n = data.shape[naxis - ax]
        v = _axis_values(header, ax, n)
        unit = str(header.get(f"CUNIT{ax}", "")).strip().lower()
        if role in ("az", "za") and unit in ("", "deg", "degree", "degrees"):
            v = np.deg2rad(v)
        return v

    az, za, freqs = _vals("az"), _vals("za"), _vals("freq")

    feeds = None
    fl = header.get("FEEDLIST")
    if fl is not None:
        feeds = [f.strip().strip("'\"").lower() for f in str(fl).strip("[] ").split(",") if f.strip()]
    if beam_type == "efield" and feeds is not None and len(feeds) != arr.shape[1]:
        raise ValueError(
            f"{path!r}: FEEDLIST {feeds} does not match the feed axis "
            f"length {arr.shape[1]}"
        )

    basis = None
    for hdr_e, data_e in hdus[1:]:
        if str(hdr_e.get("EXTNAME", "")).strip().upper() == "BASISVEC":
            basis = data_e
            if basis is not None:
                # FITS order reversed; pyuvdata writes (az, za, axis, vec)
                # in FITS axes -> numpy (vec, axis, za, az) already matches
                # the from_uvbeam contract after the standard reversal.
                basis = np.asarray(basis)

    ns = _Namespace(
        data_array=arr,
        axis1_array=az,
        axis2_array=za,
        freq_array=freqs,
        beam_type=beam_type,
        feed_array=np.asarray(feeds) if feeds else np.asarray([]),
        x_orientation=header.get("XORIENT", "east"),
        pixel_coordinate_system="az_za",
    )
    if basis is not None:
        ns.basis_vector_array = basis
    return GriddedBeam.from_uvbeam(ns)


def write_beamfits(beam: GriddedBeam, path: str, feeds=("x", "y")) -> None:
    """Write a :class:`GriddedBeam` to a beamfits file.

    Layout follows pyuvdata's beamfits conventions: primary HDU data with
    FITS axes (1=AZIMUTH deg, 2=ZENANGLE deg, 3=FREQ Hz, 4=FEEDIND/STOKES,
    5=IF, 6=VECIND[, 7=COMPLEX for efield]), regular axes encoded via
    CRVAL/CDELT/CRPIX, plus a BASISVEC image extension holding the standard
    az/za unit basis. Round-trips through :func:`read_beamfits`.

    Frequencies must be uniformly spaced (or a single frequency) — the only
    thing a FITS linear axis can represent.
    """
    freqs = beam.freq_array
    if freqs.size > 1:
        df = np.diff(freqs)
        if np.any(np.abs(df - df[0]) > 1e-3 * max(abs(df[0]), 1e-12)):
            raise ValueError(
                "beamfits requires uniformly spaced frequencies; "
                "interp_freq() onto a regular grid first"
            )
        fstep = float(df[0])
    else:
        fstep = 1.0

    data = beam.data_array  # (vec, feed, freq, za, az)
    nvec, nfeed, nf, nza, naz = data.shape
    if beam.beam_type == "efield":
        # numpy (complex, vec, spw, feed, freq, za, az); FITS axes reversed
        # give (az, za, freq, feed, spw, vec, complex) = the CTYPE order.
        full = np.stack([np.asarray(data.real, dtype=np.float64),
                         np.asarray(data.imag, dtype=np.float64)])[:, :, None]
        ctypes = [
            ("AZIMUTH", "deg"), ("ZENANGLE", "deg"), ("FREQ", "Hz"),
            ("FEEDIND", ""), ("IF", ""), ("VECIND", ""), ("COMPLEX", ""),
        ]
    else:
        # numpy (vec, spw, pol, freq, za, az); FITS axes reversed give
        # (az, za, freq, pol, spw, vec) = the CTYPE order (pol rides the
        # STOKES axis slot).
        full = np.asarray(data.real, dtype=np.float64)[:, None]
        ctypes = [
            ("AZIMUTH", "deg"), ("ZENANGLE", "deg"), ("FREQ", "Hz"),
            ("STOKES", ""), ("IF", ""), ("VECIND", ""),
        ]

    axes_vals = [
        (np.rad2deg(beam.axis1_array[0]), np.rad2deg(beam.axis1_array[1] - beam.axis1_array[0]) if naz > 1 else 1.0),
        (np.rad2deg(beam.axis2_array[0]), np.rad2deg(beam.axis2_array[1] - beam.axis2_array[0]) if nza > 1 else 1.0),
        (float(freqs[0]), fstep),
        (1.0, 1.0),
        (1.0, 1.0),
        (1.0, 1.0),
    ]
    if beam.beam_type == "efield":
        axes_vals.append((1.0, 1.0))
        # numpy shape: (2, nvec, 1, nfeed, nf, nza, naz); FITS reversed =
        # (naz, nza, nf, nfeed, 1, nvec, 2) matching ctypes order.
    cards = [("BTYPE", beam.beam_type, "beam type"),
             ("COORDSYS", "az_za", "pixel coordinate system"),
             ("NORMSTD", "physical", "normalization standard"),
             ("XORIENT", "east", "x-feed orientation"),
             ("FEEDLIST", "[" + ", ".join(feeds[:nfeed]) + "]", "feeds")]
    for i, ((ctype, cunit), (crval, cdelt)) in enumerate(zip(ctypes, axes_vals), start=1):
        cards.append((f"CTYPE{i}", ctype))
        cards.append((f"CRVAL{i}", float(crval)))
        cards.append((f"CDELT{i}", float(cdelt)))
        cards.append((f"CRPIX{i}", 1.0))
        if cunit:
            cards.append((f"CUNIT{i}", cunit))

    basis = np.zeros((2, 2, nza, naz))
    basis[0, 0] = 1.0
    basis[1, 1] = 1.0
    basis_cards = [
        ("EXTNAME", "BASISVEC", "basis vector array"),
        ("COORDSYS", "az_za"),
        ("CTYPE1", "AZIMUTH"), ("CRVAL1", axes_vals[0][0]), ("CDELT1", axes_vals[0][1]), ("CRPIX1", 1.0), ("CUNIT1", "deg"),
        ("CTYPE2", "ZENANGLE"), ("CRVAL2", axes_vals[1][0]), ("CDELT2", axes_vals[1][1]), ("CRPIX2", 1.0), ("CUNIT2", "deg"),
        ("CTYPE3", "AXISIND"), ("CRVAL3", 1.0), ("CDELT3", 1.0), ("CRPIX3", 1.0),
        ("CTYPE4", "VECIND"), ("CRVAL4", 1.0), ("CDELT4", 1.0), ("CRPIX4", 1.0),
    ]
    _write_hdus(path, [(cards, full), (basis_cards, basis)])
