"""Geometry-kernel differential fuzzer: random CONVEX polygon pairs, the
engine's Greiner–Hormann boolean ops (functions/geomkernel.py) compared
against an INDEPENDENT Sutherland–Hodgman convex-clip reference.

Why convex: S–H clipping is exact and trivially correct for convex
subject/clip pairs, giving a true oracle for intersection AREA; union and
difference areas then follow by inclusion–exclusion
(|A∪B| = |A|+|B|−|A∩B|, |A\\B| = |A|−|A∩B|), so all three G–H operations
are checked from one reference clip. Invariants checked per pair:
  - area(A∩B) == SH reference area
  - area(A∪B) == |A|+|B|−|A∩B|
  - area(A\\B) == |A|−|A∩B|
  - containment/ordering sanity: 0 ≤ |A∩B| ≤ min(|A|,|B|) ≤ max ≤ |A∪B|

Usage: python scripts/geo_fuzz.py [n_pairs] [seed]
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from trino_spark.functions import geomkernel as gk  # noqa: E402

EPS = 1e-7


def convex_polygon(rng: random.Random, cx: float, cy: float, r: float) -> list:
    """Random convex polygon ring: closed convex hull of random points in
    a disc (gk.convex_hull returns a bare CCW point list)."""
    pts = []
    for _ in range(rng.randint(5, 12)):
        a = rng.uniform(0, 6.283185307)
        d = r * (0.3 + 0.7 * rng.random())
        pts.append((cx + d * _cos(a), cy + d * _sin(a)))
    hull = gk.convex_hull(pts)
    if len(hull) < 3:
        return None
    return list(hull) + [hull[0]]


def _cos(a):
    import math

    return math.cos(a)


def _sin(a):
    import math

    return math.sin(a)


def sh_clip(subject: list, clip: list) -> list:
    """Sutherland–Hodgman: clip convex `subject` ring by convex `clip`
    ring (both closed, CCW or CW — orientation handled via signed side)."""

    def _ccw(ring):
        s = sum(
            (ring[i + 1][0] - ring[i][0]) * (ring[i + 1][1] + ring[i][1])
            for i in range(len(ring) - 1)
        )
        return list(ring) if s < 0 else list(reversed(ring))

    out = _ccw(subject)[:-1]
    clip_r = _ccw(clip)
    for i in range(len(clip_r) - 1):
        a, b = clip_r[i], clip_r[i + 1]
        if not out:
            return []
        inp, out = out, []

        def inside(p):
            return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -EPS

        def isect(p, q):
            x1, y1, x2, y2 = a[0], a[1], b[0], b[1]
            x3, y3, x4, y4 = p[0], p[1], q[0], q[1]
            den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
            t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
            return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))

        for j in range(len(inp)):
            p, q = inp[j], inp[(j + 1) % len(inp)]
            if inside(q):
                if not inside(p):
                    out.append(isect(p, q))
                out.append(q)
            elif inside(p):
                out.append(isect(p, q))
    return out


def ring_area(pts: list) -> float:
    if len(pts) < 3:
        return 0.0
    s = 0.0
    for i in range(len(pts)):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % len(pts)]
        s += x1 * y2 - x2 * y1
    return abs(s) / 2.0


def fuzz_geo(n_pairs: int = 50, seed: int = 42, tol: float = 1e-6):
    """Returns mismatch descriptions (empty = clean)."""
    rng = random.Random(seed)
    bad: list[str] = []
    tested = 0
    for i in range(n_pairs):
        # overlapping, disjoint, and nested configurations
        mode = rng.choice(["overlap", "overlap", "disjoint", "nested"])
        ra = rng.uniform(1.0, 3.0)
        a_ring = convex_polygon(rng, 0.0, 0.0, ra)
        if mode == "disjoint":
            b_ring = convex_polygon(rng, 10.0 + rng.random(), 10.0, 1.5)
        elif mode == "nested":
            b_ring = convex_polygon(rng, 0.0, 0.0, 0.25 * ra)
        else:
            b_ring = convex_polygon(rng, rng.uniform(0.5, 2.0), rng.uniform(-1, 1), 2.0)
        if a_ring is None or b_ring is None:
            continue
        tested += 1
        A = ("POLYGON", [a_ring])
        B = ("POLYGON", [b_ring])
        area_a, area_b = gk.area(A), gk.area(B)
        ref_int = ring_area(sh_clip(a_ring, b_ring))
        try:
            got_int = gk.area(gk.intersection(A, B))
            got_uni = gk.area(gk.union(A, B))
            got_dif = gk.area(gk.difference(A, B))
        except Exception as exc:
            bad.append(f"pair{i} ({mode}) KERNEL ERROR: {str(exc).splitlines()[0][:140]}")
            continue
        scale = max(area_a, area_b, 1.0)
        checks = [
            ("intersection", got_int, ref_int),
            ("union", got_uni, area_a + area_b - ref_int),
            ("difference", got_dif, area_a - ref_int),
        ]
        for op, got, want in checks:
            if abs(got - want) > tol * scale:
                bad.append(
                    f"pair{i} ({mode}) {op} DIVERGED: kernel={got:.9f} "
                    f"reference={want:.9f} (areas A={area_a:.6f} B={area_b:.6f})"
                )
        if not (
            -tol <= got_int <= min(area_a, area_b) + tol * scale
            and max(area_a, area_b) - tol * scale <= got_uni
        ):
            bad.append(f"pair{i} ({mode}) ORDERING violated")
    if tested < n_pairs // 2:
        bad.append(f"VACUOUS: only {tested}/{n_pairs} pairs produced valid rings")
    return bad


def star_polygon(rng: random.Random, cx: float, cy: float, r: float) -> list:
    """Random simple CONCAVE polygon: radius varies per angle (star-shaped
    around its center → always simple, usually non-convex)."""
    import math

    n = rng.randint(6, 14)
    ring = []
    for k in range(n):
        a = 2 * math.pi * k / n + rng.uniform(-0.2, 0.2) / n
        d = r * rng.uniform(0.35, 1.0)
        ring.append((cx + d * math.cos(a), cy + d * math.sin(a)))
    ring.append(ring[0])
    return ring


def fuzz_geo_concave(n_pairs: int = 50, seed: int = 42, tol: float = 1e-6):
    """Concave pairs have no simple external oracle; instead check the
    inclusion–exclusion IDENTITIES that independent G–H runs (different
    flag configurations per op) must jointly satisfy:
      |A∩B| + |A\\B| = |A|      |A∪B| + |A∩B| = |A| + |B|
      |A∩B| = |B∩A|             |A∪B| = |B∪A|
    A bookkeeping bug in any one op breaks a joint identity."""
    rng = random.Random(seed)
    bad: list[str] = []
    for i in range(n_pairs):
        a_ring = star_polygon(rng, 0.0, 0.0, rng.uniform(1.5, 3.0))
        b_ring = star_polygon(rng, rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5), 2.0)
        A = ("POLYGON", [a_ring])
        B = ("POLYGON", [b_ring])
        try:
            ai, bi = gk.area(A), gk.area(B)
            i_ab = gk.area(gk.intersection(A, B))
            i_ba = gk.area(gk.intersection(B, A))
            u_ab = gk.area(gk.union(A, B))
            u_ba = gk.area(gk.union(B, A))
            d_ab = gk.area(gk.difference(A, B))
        except Exception as exc:
            bad.append(f"concave{i} KERNEL ERROR: {str(exc).splitlines()[0][:140]}")
            continue
        scale = max(ai, bi, 1.0)
        checks = [
            ("symmetry ∩", i_ab, i_ba),
            ("symmetry ∪", u_ab, u_ba),
            ("A = A∩B + A\\B", ai, i_ab + d_ab),
            ("A+B = A∪B + A∩B", ai + bi, u_ab + i_ab),
        ]
        for label, x, y in checks:
            if abs(x - y) > tol * scale:
                bad.append(
                    f"concave{i} IDENTITY {label} broken: {x:.9f} vs {y:.9f} "
                    f"(|A|={ai:.6f} |B|={bi:.6f} ∩={i_ab:.6f} ∪={u_ab:.6f})"
                )
    return bad


def fuzz_de9im(n: int, seed: int) -> list:
    """DE-9IM matrix vs the kernel's own OGC predicates — the predicates
    ARE matrix patterns, so any disagreement is a bug in one of them
    (this mode found the touches() line-line proper-crossing bug in
    round 5). Mixed point/line/polygon pairs, grid-snapped coordinates
    mixed in so touching/collinear cases actually occur."""
    rng = random.Random(seed)
    bad = []

    def coord():
        return rng.choice([rng.uniform(0, 10), float(rng.randint(0, 10))])

    def rand_geom():
        kind = rng.randrange(3)
        if kind == 0:
            return ("POINT", (coord(), coord()))
        if kind == 1:
            return ("LINESTRING", [(coord(), coord()) for _ in range(rng.randint(2, 4))])
        x, y = coord(), coord()
        w, h = rng.uniform(0.5, 4), rng.uniform(0.5, 4)
        return ("POLYGON", [[(x, y), (x + w, y), (x + w, y + h), (x, y + h), (x, y)]])

    tested = 0
    for i in range(n):
        a, b = rand_geom(), rand_geom()
        m = gk.relate_matrix(a, b)
        da, db = gk._dim(a), gk._dim(b)
        if da < db:
            exp_cross = m[0] != "F" and m[2] != "F"
        elif da > db:
            exp_cross = m[0] != "F" and m[6] != "F"
        elif da == 1:
            exp_cross = m[0] == "0"
        else:
            exp_cross = False
        exp = {
            "intersects": not (m[0] == "F" and m[1] == "F" and m[3] == "F" and m[4] == "F"),
            "contains": m[0] != "F" and m[6] == "F" and m[7] == "F",
            "within": m[0] != "F" and m[2] == "F" and m[5] == "F",
            "touches": m[0] == "F" and (m[1] != "F" or m[3] != "F" or m[4] != "F"),
            "crosses": exp_cross,
        }
        for name, want in exp.items():
            got = getattr(gk, name)(a, b)
            if got != want:
                bad.append(
                    f"de9im{i} {name}: matrix {m} says {want}, predicate says {got} "
                    f"| {gk.to_wkt(a)} | {gk.to_wkt(b)}"
                )
        tested += 1
    if tested != n:  # vacuity guard
        bad.append(f"de9im mode only tested {tested}/{n} pairs")
    return bad


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    bad = fuzz_geo(n, seed)
    bad += [f"[concave] {x}" for x in fuzz_geo_concave(n, seed + 1)]
    bad += [f"[de9im] {x}" for x in fuzz_de9im(4 * n, seed + 2)]
    for line in bad:
        print(line)
    print(f"\n{n} convex pairs, {len(bad)} mismatches (seed {seed})")
    sys.exit(1 if bad else 0)
