"""WKT / WKB codec in pure NumPy + stdlib — no GEOS/shapely available
in this environment, so the engine carries geometry as standard
little-endian WKB ``BinaryType`` columns and decodes to flat NumPy
coordinate arrays inside Arrow batches.

Re-creates the reference's readers (S2 src/reader.cpp:21-59 WKT,
S3 src/reader.cpp:61-100 hex-WKB) including multipart explosion
(src/reader.cpp:44-50): MULTI*/GEOMETRYCOLLECTION are split into their
parts at parse time.

Internal geometry representation: ``(gtype, rings)`` where gtype is
1=Point, 2=LineString, 3=Polygon (same codes as the reference wire
format, src/mpi_util.cpp:1080-1099) and rings is a list of (n,2)
float64 arrays (one entry for Point/LineString; exterior+holes for
Polygon — unlike the reference's MPI path we never drop holes,
cf. src/mpi_util.cpp:1152).
"""

from __future__ import annotations

import struct

import numpy as np

POINT, LINESTRING, POLYGON = 1, 2, 3
_MULTI = {4: POINT, 5: LINESTRING, 6: POLYGON}

# ---------------------------------------------------------------- WKT


def _split_top(s: str) -> list[str]:
    """Split a parenthesised list on top-level commas."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def _coords(text: str) -> np.ndarray:
    """'x y, x y, ...' -> (n,2) float64 (extra dims ignored)."""
    rows = [t.split() for t in text.split(",")]
    return np.array([[float(r[0]), float(r[1])] for r in rows], dtype=np.float64)


def parse_wkt(wkt: str) -> list[tuple[int, list[np.ndarray]]]:
    """Parse one WKT string into a list of simple geometries
    (multiparts exploded, matching src/reader.cpp:44-50). Raises
    ValueError on garbage — callers drop bad rows like the reference
    (src/reader.cpp:36-40).
    """
    s = wkt.strip()
    if not s:
        raise ValueError("empty WKT")
    i = s.index("(")
    tag = s[:i].strip().upper().replace(" Z", "").replace(" M", "")
    body = s[i:].strip()
    if not (body.startswith("(") and body.endswith(")")):
        raise ValueError(f"bad WKT body: {wkt[:40]}")
    inner = body[1:-1].strip()
    if tag == "POINT":
        return [(POINT, [_coords(inner)])]
    if tag == "LINESTRING":
        return [(LINESTRING, [_coords(inner)])]
    if tag == "POLYGON":
        rings = [_coords(p.strip().strip("()")) for p in _split_top(inner)]
        return [(POLYGON, rings)]
    if tag == "MULTIPOINT":
        pts = [p.strip().strip("()") for p in _split_top(inner)]
        return [(POINT, [_coords(p)]) for p in pts]
    if tag == "MULTILINESTRING":
        return [
            (LINESTRING, [_coords(p.strip().strip("()"))]) for p in _split_top(inner)
        ]
    if tag == "MULTIPOLYGON":
        out = []
        for poly in _split_top(inner):
            poly = poly.strip()
            poly = poly[1:-1]  # strip outer paren of this polygon
            rings = [_coords(p.strip().strip("()")) for p in _split_top(poly)]
            out.append((POLYGON, rings))
        return out
    if tag == "GEOMETRYCOLLECTION":
        out = []
        for part in _split_top(inner):
            out.extend(parse_wkt(part))
        return out
    raise ValueError(f"unsupported WKT type {tag!r}")


def to_wkt(gtype: int, rings: list[np.ndarray]) -> str:
    def ring_txt(r: np.ndarray) -> str:
        return ", ".join(f"{x:.10g} {y:.10g}" for x, y in r)

    if gtype == POINT:
        return f"POINT ({ring_txt(rings[0])})"
    if gtype == LINESTRING:
        return f"LINESTRING ({ring_txt(rings[0])})"
    return "POLYGON (" + ", ".join(f"({ring_txt(r)})" for r in rings) + ")"


# ---------------------------------------------------------------- WKB

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")


def to_wkb(gtype: int, rings: list[np.ndarray]) -> bytes:
    """Standard little-endian ISO WKB for Point/LineString/Polygon."""
    if gtype == POINT:
        return _HDR.pack(1, 1) + rings[0][0].astype("<f8").tobytes()
    if gtype == LINESTRING:
        r = np.ascontiguousarray(rings[0], dtype="<f8")
        return _HDR.pack(1, 2) + _U32.pack(len(r)) + r.tobytes()
    parts = [_HDR.pack(1, 3), _U32.pack(len(rings))]
    for r in rings:
        r = np.ascontiguousarray(r, dtype="<f8")
        parts.append(_U32.pack(len(r)) + r.tobytes())
    return b"".join(parts)


def from_wkb(buf: bytes) -> list[tuple[int, list[np.ndarray]]]:
    """Decode WKB; multiparts/collections exploded into simple parts."""
    geoms: list[tuple[int, list[np.ndarray]]] = []
    _decode(memoryview(buf), 0, geoms)
    return geoms


def _decode(mv: memoryview, off: int, out: list) -> int:
    byte_order = mv[off]
    fmt_u32 = "<I" if byte_order == 1 else ">I"
    fmt_f8 = "<f8" if byte_order == 1 else ">f8"
    (gtype,) = struct.unpack_from(fmt_u32, mv, off + 1)
    gtype = gtype % 1000  # tolerate EWKB-ish Z/M offsets
    off += 5
    if gtype == 1:
        pt = np.frombuffer(mv, dtype=fmt_f8, count=2, offset=off).astype(np.float64)
        out.append((POINT, [pt.reshape(1, 2)]))
        return off + 16
    if gtype == 2:
        (n,) = struct.unpack_from(fmt_u32, mv, off)
        off += 4
        arr = np.frombuffer(mv, dtype=fmt_f8, count=2 * n, offset=off)
        out.append((LINESTRING, [arr.astype(np.float64).reshape(n, 2)]))
        return off + 16 * n
    if gtype == 3:
        (nr,) = struct.unpack_from(fmt_u32, mv, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt_u32, mv, off)
            off += 4
            arr = np.frombuffer(mv, dtype=fmt_f8, count=2 * n, offset=off)
            rings.append(arr.astype(np.float64).reshape(n, 2))
            off += 16 * n
        out.append((POLYGON, rings))
        return off
    if gtype in (4, 5, 6, 7):
        (n,) = struct.unpack_from(fmt_u32, mv, off)
        off += 4
        for _ in range(n):
            off = _decode(mv, off, out)
        return off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_bounds(buf: bytes) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) over all parts — the reference's
    envelope projection F1 (src/spatial_join.cpp:20)."""
    minx = miny = np.inf
    maxx = maxy = -np.inf
    for _, rings in from_wkb(buf):
        for r in rings:
            minx = min(minx, r[:, 0].min())
            maxx = max(maxx, r[:, 0].max())
            miny = min(miny, r[:, 1].min())
            maxy = max(maxy, r[:, 1].max())
    return float(minx), float(miny), float(maxx), float(maxy)


def wkb_num_points(buf: bytes) -> int:
    """GEOS getNumPoints analog (reference refine kernel counts
    intersection vertices, src/thread_util.cpp:425)."""
    return sum(len(r) for _, rings in from_wkb(buf) for r in rings)
