"""geo_shape geometry: WKT parsing and vectorized spatial relations
(server/src/main/java/org/elasticsearch/common/geo/ parsers + relation
logic behind GeoShapeFieldMapper / GeoShapeQueryBuilder — the reference
delegates the physical predicates to Lucene's tessellated triangles; here
the same INTERSECTS / WITHIN / DISJOINT / CONTAINS semantics are computed
directly with numpy kernels over coordinate arrays).

All kernels are vectorized over N candidate geometries at once (arrays of
points or axis-aligned boxes) against one query geometry — the shape used
inside a map_batches filter stage.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "parse_wkt",
    "points_in_polygon",
    "segments_intersect_boxes",
    "boxes_within_convex",
    "boxes_intersect_convex",
    "geohash_encode",
    "geotile_cell",
    "geohex_cell",
]

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: np.ndarray, lon: np.ndarray, precision: int) -> list[str]:
    """Vectorized geohash (public base32 bit-interleaving algorithm)."""
    nbits = precision * 5
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    lx = np.minimum((lon + 180.0) / 360.0 * (1 << lon_bits),
                    (1 << lon_bits) - 1).astype(np.int64)
    ly = np.minimum((lat + 90.0) / 180.0 * (1 << lat_bits),
                    (1 << lat_bits) - 1).astype(np.int64)
    bits = np.zeros(lat.shape, dtype=np.int64)
    xi, yi = lon_bits - 1, lat_bits - 1
    for b in range(nbits):
        if b % 2 == 0:  # even bit (from MSB): longitude
            bits = (bits << 1) | ((lx >> xi) & 1)
            xi -= 1
        else:
            bits = (bits << 1) | ((ly >> yi) & 1)
            yi -= 1
    out = []
    for v in bits:
        s = "".join(_GEOHASH32[(int(v) >> (5 * (precision - 1 - i))) & 31]
                    for i in range(precision))
        out.append(s)
    return out


def geotile_cell(lat: np.ndarray, lon: np.ndarray, z: int) -> list[str]:
    """Web-mercator z/x/y tile keys (GeoTileUtils.java formula)."""
    n = 1 << z
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    latr = np.radians(np.clip(lat, -85.05112878, 85.05112878))
    y = np.floor((1.0 - np.arcsinh(np.tan(latr)) / np.pi) / 2.0 * n
                 ).astype(np.int64)
    return [f"{z}/{xi}/{yi}" for xi, yi in
            zip(np.clip(x, 0, n - 1), np.clip(y, 0, n - 1))]


def geohex_cell(lat: np.ndarray, lon: np.ndarray, size_deg: float = 15.0
                ) -> list[str]:
    """Axial hex cell ids on the equirectangular plane (documented H3
    substitute, same cube-rounding kernel as the geohex_grid agg; ties
    use floor(x+0.5) so numpy and SQL agree)."""
    sq3 = np.sqrt(3.0)
    xq = (sq3 / 3.0 * lon - lat / 3.0) / size_deg
    zr = (2.0 / 3.0 * lat) / size_deg
    yq = -xq - zr
    rx = np.floor(xq + 0.5)
    ry = np.floor(yq + 0.5)
    rz = np.floor(zr + 0.5)
    dx, dy, dz = np.abs(rx - xq), np.abs(ry - yq), np.abs(rz - zr)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = (~fix_x) & (~(dy > dz))
    hq = np.where(fix_x, -ry - rz, rx).astype(np.int64)
    hr = np.where(fix_z, -rx - ry, rz).astype(np.int64)
    return [f"{q}:{r}" for q, r in zip(hq, hr)]


def parse_wkt(wkt: str):
    """Parse a WKT subset: POINT, LINESTRING, POLYGON (outer ring + holes),
    ENVELOPE (the ES extension: minLon maxLon maxLat minLat). Returns
    (kind, coords) where coords are numpy float64 arrays of (x, y) pairs
    (lon, lat order per WKT)."""
    s = wkt.strip()
    m = re.match(r"(\w+)\s*\((.*)\)\s*$", s, re.S)
    if not m:
        raise ValueError(f"unparseable WKT: {wkt!r}")
    kind = m.group(1).upper()
    body = m.group(2)

    def pairs(txt: str) -> np.ndarray:
        pts = []
        for tok in txt.split(","):
            x, y = tok.split()[:2]
            pts.append((float(x), float(y)))
        return np.asarray(pts, np.float64)

    if kind == "POINT":
        return "point", pairs(body)[0]
    if kind == "LINESTRING":
        return "linestring", pairs(body)
    if kind == "ENVELOPE":
        vals = [float(x) for x in body.replace(",", " ").split()]
        minlon, maxlon, maxlat, minlat = vals
        return "envelope", np.array([[minlon, minlat], [maxlon, maxlat]])
    if kind == "POLYGON":
        rings = [pairs(r) for r in re.findall(r"\(([^()]*)\)", body)]
        return "polygon", rings

    def split_top(txt: str) -> list[str]:
        # split on commas at paren depth 0 (WKT multi-geometry separators)
        parts, depth, cur = [], 0, []
        for ch in txt:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        return [p.strip() for p in parts]

    if kind == "MULTIPOINT":
        # both WKT forms: (10 40), (40 30)  and  10 40, 40 30
        return "multipoint", pairs(body.replace("(", " ").replace(")", " "))
    if kind == "MULTILINESTRING":
        return "multilinestring", [
            pairs(p.strip().strip("()")) for p in split_top(body)]
    if kind == "MULTIPOLYGON":
        polys = []
        for p in split_top(body):
            inner = p.strip()
            if inner.startswith("(") and inner.endswith(")"):
                inner = inner[1:-1]
            polys.append([pairs(r) for r in re.findall(r"\(([^()]*)\)", inner)])
        return "multipolygon", polys
    if kind == "GEOMETRYCOLLECTION":
        return "geometrycollection", [parse_wkt(p) for p in split_top(body)]
    raise ValueError(f"unsupported WKT kind {kind!r}")


def _ring_contains(ring: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Crossing-number point-in-ring test, vectorized over points."""
    inside = np.zeros(x.shape, bool)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        crosses = (y1 > y) != (y2 > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
        inside ^= crosses & (x < xint)
    return inside


def points_in_polygon(rings: list[np.ndarray], x: np.ndarray,
                      y: np.ndarray) -> np.ndarray:
    """Inside the outer ring and outside every hole."""
    inside = _ring_contains(rings[0], x, y)
    for hole in rings[1:]:
        inside &= ~_ring_contains(hole, x, y)
    return inside


def _segs_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Proper/improper segment intersection via orientation signs,
    vectorized (all args broadcastable arrays)."""

    def cross(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    d1 = cross(bx1, by1, bx2, by2, ax1, ay1)
    d2 = cross(bx1, by1, bx2, by2, ax2, ay2)
    d3 = cross(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = cross(ax1, ay1, ax2, ay2, bx2, by2)
    straddle = ((d1 * d2) < 0) & ((d3 * d4) < 0)
    # collinear touching counts as intersecting
    def on(ox, oy, px, py, qx, qy, d):
        return (d == 0) & (np.minimum(ox, px) <= qx) & (qx <= np.maximum(ox, px)) \
            & (np.minimum(oy, py) <= qy) & (qy <= np.maximum(oy, py))

    touch = (on(bx1, by1, bx2, by2, ax1, ay1, d1)
             | on(bx1, by1, bx2, by2, ax2, ay2, d2)
             | on(ax1, ay1, ax2, ay2, bx1, by1, d3)
             | on(ax1, ay1, ax2, ay2, bx2, by2, d4))
    return straddle | touch


def segments_intersect_boxes(line: np.ndarray, blo: np.ndarray,
                             bhi: np.ndarray) -> np.ndarray:
    """LINESTRING vs N axis-aligned boxes: True where any line segment
    intersects the box. blo/bhi: (N, 2) lower/upper corners (x, y)."""
    n = blo.shape[0]
    hit = np.zeros(n, bool)
    for i in range(len(line) - 1):
        (x1, y1), (x2, y2) = line[i], line[i + 1]
        # endpoint inside box
        for (px, py) in ((x1, y1), (x2, y2)):
            hit |= ((blo[:, 0] <= px) & (px <= bhi[:, 0])
                    & (blo[:, 1] <= py) & (py <= bhi[:, 1]))
        # segment vs each box edge
        ex = (blo[:, 0], bhi[:, 0], bhi[:, 0], blo[:, 0])
        ey = (blo[:, 1], blo[:, 1], bhi[:, 1], bhi[:, 1])
        for j in range(4):
            k = (j + 1) % 4
            hit |= _segs_intersect(x1, y1, x2, y2,
                                   ex[j], ey[j], ex[k], ey[k])
    return hit


def _convex_halfplanes(ring: np.ndarray):
    """(a, b, c) arrays such that inside <=> a*x + b*y <= c for every edge
    of a counter-clockwise convex ring."""
    # ensure CCW via the shoelace sign
    area2 = np.sum(ring[:, 0] * np.roll(ring[:, 1], -1)
                   - np.roll(ring[:, 0], -1) * ring[:, 1])
    if area2 < 0:
        ring = ring[::-1]
    p1 = ring
    p2 = np.roll(ring, -1, axis=0)
    a = p2[:, 1] - p1[:, 1]
    b = -(p2[:, 0] - p1[:, 0])
    c = a * p1[:, 0] + b * p1[:, 1]
    return a, b, c


def boxes_within_convex(ring: np.ndarray, blo: np.ndarray,
                        bhi: np.ndarray) -> np.ndarray:
    """WITHIN: every corner of each box inside the convex ring (for convex
    query shapes, corner containment == full containment)."""
    a, b, c = _convex_halfplanes(ring)
    out = np.ones(blo.shape[0], bool)
    for cx, cy in ((blo[:, 0], blo[:, 1]), (bhi[:, 0], blo[:, 1]),
                   (bhi[:, 0], bhi[:, 1]), (blo[:, 0], bhi[:, 1])):
        # corner inside <=> all half-planes satisfied
        ok = np.ones(blo.shape[0], bool)
        for i in range(len(a)):
            ok &= (a[i] * cx + b[i] * cy) <= c[i] + 1e-9
        out &= ok
    return out


def boxes_intersect_convex(ring: np.ndarray, blo: np.ndarray,
                           bhi: np.ndarray) -> np.ndarray:
    """INTERSECTS between N axis-aligned boxes and one convex ring, by the
    separating-axis theorem: a separating axis exists only among the box's
    two axes and the ring's edge normals."""
    n = blo.shape[0]
    # box axes: ring entirely left/right/below/above the box
    rx, ry = ring[:, 0], ring[:, 1]
    sep = ((rx.max() < blo[:, 0]) | (rx.min() > bhi[:, 0])
           | (ry.max() < blo[:, 1]) | (ry.min() > bhi[:, 1]))
    # ring edge normals: box's most-inside corner still outside a half-plane
    a, b, c = _convex_halfplanes(ring)
    for i in range(len(a)):
        # minimize a*x + b*y over the box corners
        mn = (np.where(a[i] >= 0, blo[:, 0], bhi[:, 0]) * a[i]
              + np.where(b[i] >= 0, blo[:, 1], bhi[:, 1]) * b[i])
        sep |= mn > c[i] + 1e-9
    return ~sep
