"""Exact polygon-union BOUNDARY as vector geometry (SURVEY.md §2.10
U7 vector form) — no geometry library.

The reference unions footprint polygons with shapely and consumes the
result's bbox/mask (main.py:386-388, 241, 382); the union *measure*
has been native here since r7 (``geo_polygon_union_exact``'s even-odd
rasterization). This module closes the remaining gap — the union's
boundary as actual rings — with a planar clipping kernel built from
scratch on exact rational arithmetic:

**Algorithm (vertical slab decomposition).** Every input coordinate
is lifted to ``Fraction`` (exactly — floats are rationals). Event
x-coordinates are all vertices plus all pairwise edge-crossing x's,
so inside each open slab between consecutive events no two edges
cross and their vertical order is constant. Sweeping each slab's
edges bottom-up while maintaining per-group crossing parity yields,
exactly: (a) the sub-segments where union-interior flips — these ARE
the boundary (∂(∪Pᵢ) ⊆ ∪∂Pᵢ, so the boundary is made of input-edge
pieces); (b) the exact union area (trapezoid integration); (c) the
interior y-intervals at each slab border, whose left/right symmetric
difference classifies vertical input edges (the only edges a vertical
sweep line never crosses transversally). All pieces carry exact
endpoints, so stitching them into closed rings is pure hash-map
adjacency walking (even vertex degrees are asserted, not hoped for).

**Semantics / associativity.** Input is a list of GROUPS of rings:
region = OR over groups of (XOR over the group's rings of even-odd
interior). A fresh polygon is a one-ring group; the kernel's OUTPUT
ring set reconstructs its region by total crossing parity, i.e. it is
itself one XOR-group. Union is therefore ASSOCIATIVE over ring sets:
partial unions feed back in as single groups, which is exactly the
distributed scale path — at 100 TB, per-key ring sets union in a
tree (partial combine per bucket, then combine-of-combines), the
same shape as any mergeable aggregate. ``geo_union_boundary_
hierarchical`` demonstrates it end-to-end on Spark.

**Scale.** The kernel is O((E+I)·log + S·A) per KEY (E edges, I
crossings, S slabs, A active edges/slab) and keys are the parallel
unit (``applyInPandas`` groups); a key's ring set is a bounded model
artifact like a codebook, and the hierarchical variant bounds even
that (each task unions only a bucket's rings). ``UNION_EDGE_CAP``
guards the accidental giant key the same way CONTAIN_DF_CAP guards
posting lists.
"""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.operators.geometry import point_in_ring
from lake_satellite_image_etl_spark.registry import query

#: hard cap on non-vertical edges per unioned key: past this a single
#: task's O(E²) crossing enumeration stops being a bounded artifact.
#: The fix at scale is not a bigger cap but the hierarchical path
#: (union buckets first) — the error message says so.
UNION_EDGE_CAP = 20_000


#: input quantization grid for the Spark wrappers: coordinates snap
#: to multiples of 2^-20 before exact processing. Raw floats are
#: rationals with ~2^52 denominators; exact intersections COMPOUND
#: denominators multiplicatively, making Fraction arithmetic the
#: bottleneck (measured 12.6 s -> 2 s per sf0.1 body). Snapping moves
#: any vertex < 5e-7 — three orders below the rasterization cell and
#: below the no-tie margin test_clipping pins — and the kernel is
#: then EXACT for the quantized inputs (the property that matters:
#: parity/area/stitching never see an epsilon).
QUANT = 1 << 20


def _frac(v) -> Fraction:
    """Quantized-exact rational of a float (see QUANT note)."""
    return Fraction(round(float(v) * QUANT), QUANT)


# ---------------------------------------------------------------------------
# exact interval-set helpers (closed-open semantics are irrelevant:
# all sets here are finite unions of positive-length intervals and
# comparisons happen at interior midpoints only)
# ---------------------------------------------------------------------------


def _iv_merge(iv: list[tuple[Fraction, Fraction]]) -> list[tuple[Fraction, Fraction]]:
    out: list[tuple[Fraction, Fraction]] = []
    for lo, hi in sorted(iv):
        if lo >= hi:
            continue
        if out and lo <= out[-1][1]:
            if hi > out[-1][1]:
                out[-1] = (out[-1][0], hi)
        else:
            out.append((lo, hi))
    return out


def _iv_member(iv: list[tuple[Fraction, Fraction]], y: Fraction) -> bool:
    return any(lo < y < hi for lo, hi in iv)


def _iv_combine(a, b, keep) -> list[tuple[Fraction, Fraction]]:
    """Generic boolean combine of two merged interval sets: sweep the
    union of breakpoints, keep cells where ``keep(inA, inB)``."""
    pts = sorted({p for lo, hi in a + b for p in (lo, hi)})
    out = []
    for lo, hi in zip(pts, pts[1:]):
        mid = (lo + hi) / 2
        if keep(_iv_member(a, mid), _iv_member(b, mid)):
            out.append((lo, hi))
    return _iv_merge(out)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def union_boundary(
    groups: list[list[list[tuple[Fraction, Fraction]]]],
) -> tuple[list[list[tuple[Fraction, Fraction]]], Fraction, float]:
    """Exact union boundary of ``groups`` (see module docstring for
    the OR-of-XOR semantics). Returns ``(rings, area, perimeter)``:
    closed boundary rings with exact vertices whose TOTAL crossing
    parity reconstructs the region, the exact union area, and the
    (float) boundary length."""
    # -- lift coordinates to a common integer grid --------------------
    # Fraction arithmetic (a gcd per op) dominated an all-Fraction
    # sweep; on the common denominator D every endpoint is an int and
    # the hot path (crossing enumeration, slab evaluation, vertical
    # ordering) runs on plain ints with one normalization per EMITTED
    # artifact. D = lcm of input denominators: QUANT for the Spark
    # wrappers, small for hand-built test geometry. Everything below
    # works in scaled space; outputs divide by D at the very end.
    from math import lcm

    D = 1
    for rings in groups:
        for ring in rings:
            for x, y in ring:
                D = lcm(D, x.denominator, y.denominator)
    nonvert = []  # (x1, y1, x2, y2, gid) scaled ints, x1 < x2
    vert: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for gid, rings in enumerate(groups):
        for ring in rings:
            pts = [(int(x * D), int(y * D)) for x, y in ring]
            if pts and pts[0] != pts[-1]:
                pts.append(pts[0])
            for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
                if x1 == x2:
                    if y1 != y2:
                        vert[x1].append((min(y1, y2), max(y1, y2)))
                elif x1 < x2:
                    nonvert.append((x1, y1, x2, y2, gid))
                else:
                    nonvert.append((x2, y2, x1, y1, gid))
    if len(nonvert) > UNION_EDGE_CAP:
        raise ValueError(
            f"union_boundary: {len(nonvert)} edges in one key exceeds "
            f"UNION_EDGE_CAP={UNION_EDGE_CAP}; union in buckets first "
            "(geo_union_boundary_hierarchical pattern) so each task "
            "sees a bounded ring set"
        )

    # -- event x's: endpoints + pairwise transversal crossings --------
    # Fraction gives canonical hashing for set-dedup; endpoint events
    # are ints (denominator 1), crossings rational in scaled space.
    xs: set[Fraction] = set()
    for e in nonvert:
        xs.add(Fraction(e[0]))
        xs.add(Fraction(e[2]))
    for v in vert:
        xs.add(Fraction(v))
    for i in range(len(nonvert)):
        x1, y1, x2, y2, _ = nonvert[i]
        dxi, dyi = x2 - x1, y2 - y1
        for j in range(i + 1, len(nonvert)):
            u1, v1, u2, v2, _ = nonvert[j]
            lo = max(x1, u1)
            hi = min(x2, u2)
            if lo >= hi:
                continue
            dxj, dyj = u2 - u1, v2 - v1
            det = dyi * dxj - dyj * dxi
            if det == 0:  # parallel or collinear: no transversal event
                continue
            num = (v1 - y1) * dxi * dxj + dyi * dxj * x1 - dyj * dxi * u1
            # x = num / det; open-interval test without division
            if det < 0:
                num, det = -num, -det
            if lo * det < num < hi * det:
                xs.add(Fraction(num, det))
    events = sorted(xs)

    # -- slab sweep ---------------------------------------------------
    edges = sorted(nonvert)  # lexicographic: by x1 first
    ptr = 0
    active: set[int] = set()
    pieces: list[tuple[tuple[Fraction, Fraction], tuple[Fraction, Fraction]]] = []
    area = Fraction(0)
    left_limits: dict[Fraction, list] = {}
    right_limits: dict[Fraction, list] = {}
    carry: dict[int, tuple[int, int]] = {}  # edge -> y(slab left) as (num, den)
    for xa, xb in zip(events, events[1:]):
        while ptr < len(edges) and edges[ptr][0] <= xa:
            active.add(ptr)
            ptr += 1
        active = {k for k in active if edges[k][2] >= xb}
        pa, qa = xa.numerator, xa.denominator
        pb, qb = xb.numerator, xb.denominator
        rows = []
        for k in active:
            x1, y1, x2, y2, gid = edges[k]
            dx, dy = x2 - x1, y2 - y1
            ab = carry.get(k)
            if ab is None:
                ab = (y1 * dx * qa + dy * (pa - x1 * qa), dx * qa)
            nb_, db_ = y1 * dx * qb + dy * (pb - x1 * qb), dx * qb
            carry[k] = (nb_, db_)  # next slab's left is this slab's right
            na_, da_ = ab
            rows.append((na_ / da_, nb_ / db_, na_, da_, nb_, db_, gid))
        # float keys are monotone images of the exact rationals, so the
        # sort is exact except inside float-tie runs — repair those with
        # one exact sort each (rare: needs two lines within ~1e-16).
        rows.sort(key=lambda r: (r[0], r[1]))
        i = 0
        while i < len(rows):
            j = i + 1
            while j < len(rows) and rows[j][0] == rows[i][0] and rows[j][1] == rows[i][1]:
                j += 1
            if j - i > 1:
                rows[i:j] = sorted(
                    rows[i:j],
                    key=lambda r: (Fraction(r[2], r[3]), Fraction(r[4], r[5])),
                )
            i = j
        odd: set[int] = set()
        iv_a: list[tuple[Fraction, Fraction]] = []
        iv_b: list[tuple[Fraction, Fraction]] = []
        start: tuple[Fraction, Fraction] | None = None
        i = 0
        n_rows = len(rows)
        while i < n_rows:
            _, _, na_, da_, nb_, db_, _ = rows[i]
            below = bool(odd)
            j = i
            while (
                j < n_rows
                and rows[j][2] * da_ == na_ * rows[j][3]
                and rows[j][4] * db_ == nb_ * rows[j][5]
            ):
                odd.symmetric_difference_update({rows[j][6]})
                j += 1
            above = bool(odd)
            if below != above:
                ya = Fraction(na_, da_)
                yb = Fraction(nb_, db_)
                pieces.append(((xa, ya), (xb, yb)))
                if above:
                    start = (ya, yb)
                else:
                    area += (xb - xa) * ((ya - start[0]) + (yb - start[1])) / 2
                    iv_a.append((start[0], ya))
                    iv_b.append((start[1], yb))
            i = j
        if odd:
            raise AssertionError("open ring: sweep parity nonzero at slab top")
        right_limits[xa] = _iv_merge(iv_a)
        left_limits[xb] = _iv_merge(iv_b)

    # -- vertical boundary pieces at event lines ----------------------
    for v, segs in vert.items():
        vf = Fraction(v)
        left = left_limits.get(vf, [])
        right = right_limits.get(vf, [])
        jump = _iv_combine(left, right, lambda a, b: a != b)  # symmetric diff
        if not jump:
            continue
        fsegs = [(Fraction(lo), Fraction(hi)) for lo, hi in segs]
        covered = _iv_combine(jump, _iv_merge(fsegs), lambda a, b: a and b)
        if covered != jump:
            raise AssertionError(
                "interior jump off any vertical edge — boundary ⊄ input edges"
            )
        for lo, hi in jump:
            pieces.append(((vf, lo), (vf, hi)))

    # -- stitch pieces into closed rings ------------------------------
    adj: dict[tuple[Fraction, Fraction], list[int]] = defaultdict(list)
    for sid, (p, q) in enumerate(pieces):
        adj[p].append(sid)
        adj[q].append(sid)
    for p, sids in adj.items():
        if len(sids) % 2:
            raise AssertionError(f"odd boundary degree at {p}")
    used: set[int] = set()
    rings_out: list[list[tuple[Fraction, Fraction]]] = []
    perimeter = 0.0
    for sid0 in range(len(pieces)):
        if sid0 in used:
            continue
        used.add(sid0)
        start_p, cur = pieces[sid0]
        path = [start_p, cur]
        while cur != start_p:
            nxt = None
            for sid in adj[cur]:
                if sid not in used:
                    nxt = sid
                    break
            if nxt is None:  # even degrees make this unreachable
                raise AssertionError(f"boundary walk stuck at {cur}")
            used.add(nxt)
            p, q = pieces[nxt]
            cur = q if p == cur else p
            path.append(cur)
        ring = _simplify_ring(path)
        if ring is None:
            continue  # degenerate zero-area walk: parity-neutral
        ring = [(x / D, y / D) for x, y in ring]  # leave scaled space
        rings_out.append(ring)
        for (px, py), (qx, qy) in zip(ring, ring[1:]):
            perimeter += float(((px - qx) ** 2 + (py - qy) ** 2)) ** 0.5
    return rings_out, area / (D * D), perimeter


def _simplify_ring(path):
    """Drop repeated + collinear-continuation vertices from a closed
    walk; return None for zero-area (out-and-back) walks."""
    pts = path[:-1]  # open form
    # signed shoelace (exact) — zero means parity-neutral degenerate
    area2 = Fraction(0)
    n = len(pts)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        area2 += x1 * y2 - x2 * y1
    if area2 == 0:
        return None
    out = []
    for i in range(n):
        p0 = pts[(i - 1) % n]
        p1 = pts[i]
        p2 = pts[(i + 1) % n]
        if p1 == p2:
            continue
        cross = (p1[0] - p0[0]) * (p2[1] - p1[1]) - (p1[1] - p0[1]) * (p2[0] - p1[0])
        dot = (p1[0] - p0[0]) * (p2[0] - p1[0]) + (p1[1] - p0[1]) * (p2[1] - p1[1])
        if cross == 0 and dot > 0:
            continue  # straight-through vertex
        out.append(p1)
    out.append(out[0])
    return out


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

#: ring-set density for the registered entries: sparser than the
#: %500 of geo_polygon_union_exact so the per-body crossing count
#: stays a small model artifact at bench scale (sf0.1: ~30 rings ≈
#: 180 edges per body; the kernel is quadratic in edges per KEY).
UNION_MODULUS = 1000


def body_rings(spark: SparkSession, sf_dir: str, modulus: int = UNION_MODULUS) -> DataFrame:
    """(body_id, l_orderkey, ring) — the same synthetic footprint
    rings as geo_polygon_union_exact (main.py:386-388 data shape),
    parameterized by orderkey modulus."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % modulus == 0)
    geom = li.groupBy(
        (F.floor(F.col("l_orderkey") / modulus) % 5).alias("body_id"),
        F.col("l_orderkey"),
    ).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "l_linenumber",
                        "l_quantity",
                        "l_extendedprice",
                        F.array(
                            (F.col("l_quantity") % 30).cast("double"),
                            ((F.col("l_extendedprice") % 3000) / 100).cast("double"),
                        ).alias("p"),
                    )
                )
            ),
            lambda s: s["p"],
        ).alias("pts")
    )
    return geom.select(
        "body_id",
        "l_orderkey",
        F.concat(F.col("pts"), F.array(F.element_at("pts", 1))).alias("ring"),
    )


_BOUNDARY_SCHEMA = (
    "body_id long, n_polygons long, ring array<array<double>>, "
    "exact_area double, perimeter double"
)


def _boundary_kernel(pdf: pd.DataFrame, group_col: str | None) -> pd.DataFrame:
    """applyInPandas kernel: one body's rings → boundary rows (one per
    output ring, area/perimeter repeated — consumed via first())."""
    body_id = int(pdf["body_id"].iloc[0])
    if group_col is None:
        groups = [[[(_frac(x), _frac(y)) for x, y in ring]] for ring in pdf["ring"]]
        n_poly = len(pdf)
    else:
        by_bucket: dict[int, list] = defaultdict(list)
        n_by_bucket: dict[int, int] = {}
        for b, ring, np_ in zip(pdf[group_col], pdf["ring"], pdf["n_polygons"]):
            by_bucket[int(b)].append([(_frac(x), _frac(y)) for x, y in ring])
            n_by_bucket[int(b)] = int(np_)  # repeated per ring row; keep one
        groups = list(by_bucket.values())
        n_poly = sum(n_by_bucket.values())
    rings, area, perim = union_boundary(groups)
    if not rings:  # empty region: emit a degenerate parity-neutral marker
        rings = [[(Fraction(0), Fraction(0)), (Fraction(0), Fraction(0))]]
    return pd.DataFrame(
        {
            "body_id": [body_id] * len(rings),
            "n_polygons": [n_poly] * len(rings),
            "ring": [[[float(x), float(y)] for x, y in r] for r in rings],
            "exact_area": [float(area)] * len(rings),
            "perimeter": [perim] * len(rings),
        }
    )


def union_boundary_rings(body: DataFrame) -> DataFrame:
    """Per-body exact union boundary: (body_id, n_polygons, ring,
    exact_area, perimeter), one row per boundary ring. Bodies are the
    parallel unit; each task runs the exact kernel on one bounded
    ring set."""
    return body.groupBy("body_id").applyInPandas(
        lambda pdf: _boundary_kernel(pdf, None), schema=_BOUNDARY_SCHEMA
    )


def _rasterize_parity(bounds: DataFrame, grid_n: int = 30) -> DataFrame:
    """union_cells from BOUNDARY rings by total crossing parity: a
    cell center is interior iff the number of rings whose even-odd
    test contains it is odd (= total parity across all boundary
    edges). Mirrors rasterized_union_cells' grid exactly, so equality
    with the input-ring rasterization is the correctness statement
    'the boundary encloses precisely the union region' at cell
    resolution."""
    per_body = bounds.groupBy("body_id").agg(
        F.first("n_polygons").alias("n_polygons"),
        F.first("exact_area").alias("exact_area"),
        F.first("perimeter").alias("perimeter"),
        F.collect_list("ring").alias("rs"),
    )
    cells = per_body.select(
        "body_id",
        "n_polygons",
        "exact_area",
        "perimeter",
        "rs",
        F.explode(F.sequence(F.lit(0), F.lit(grid_n - 1))).alias("gx"),
    ).select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(grid_n - 1))).alias("gy")
    )
    cx = F.col("gx") + F.lit(0.5)
    cy = F.col("gy") + F.lit(0.5)
    odd = (
        F.size(
            F.filter("rs", lambda r: (F.size(r) > 1) & point_in_ring(cx, cy, r))
        )
        % 2
        == 1
    )
    out = (
        cells.select(
            "body_id",
            "n_polygons",
            "exact_area",
            "perimeter",
            odd.cast("int").alias("odd"),
        )
        .groupBy("body_id", "n_polygons", "exact_area", "perimeter")
        .agg(F.sum("odd").cast("long").alias("union_cells"))
    )
    # |exact area − cell count| is bounded by how much boundary can
    # cut cells: ≤ perimeter·(cell diameter) + slack. An independent
    # cross-check of the kernel's trapezoid integration against the
    # rasterization (tolerance embedded as a boolean, GK-oracle style).
    bound = F.col("perimeter") * 1.5 + F.lit(8.0)
    return out.select(
        "body_id",
        "n_polygons",
        "union_cells",
        (F.abs(F.col("exact_area") - F.col("union_cells")) <= bound).alias(
            "area_within_raster_bound"
        ),
    )


def _union_oracle(modulus: int) -> str:
    from lake_satellite_image_etl_spark.operators.geometry import _sql_point_in_ring

    return f"""
    WITH geom AS (
        SELECT (l_orderkey // {modulus}) % 5 AS body_id, l_orderkey,
               array_agg([
                   (l_quantity % 30)::DOUBLE, ((l_extendedprice % 3000) / 100)::DOUBLE
               ] ORDER BY l_linenumber, l_quantity, l_extendedprice) AS pts
        FROM lineitem
        WHERE l_orderkey % {modulus} = 0
        GROUP BY l_orderkey
    ),
    rings AS (SELECT body_id, pts || [pts[1]] AS ring FROM geom),
    body AS (SELECT body_id, array_agg(ring) AS rs,
                    count(*) AS n_polygons
             FROM rings GROUP BY body_id),
    grid AS (
        SELECT gx + 0.5 AS cx, gy + 0.5 AS cy
        FROM generate_series(0, 29) AS a(gx),
             generate_series(0, 29) AS b(gy)
    ),
    cells AS (
        SELECT body_id, n_polygons,
               len(list_filter(rs,
                   r -> {_sql_point_in_ring("cx", "cy", "r")})) AS hits
        FROM body, grid
    )
    SELECT body_id, n_polygons,
           sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END)::BIGINT AS union_cells,
           TRUE AS area_within_raster_bound
    FROM cells
    GROUP BY body_id, n_polygons
    """


@query("geo_polygon_union_boundary", oracle=_union_oracle(UNION_MODULUS))
def geo_polygon_union_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U7 vector form (main.py:386-388 ``reduce(union)``): the exact
    union BOUNDARY of each body's ring set as native vector rings —
    the operator the reference delegates to shapely, here a
    from-scratch exact clipping kernel (module docstring). Verified
    end-to-end against the input-side rasterization: the compared
    ``union_cells`` re-rasterizes from the OUTPUT rings by total
    crossing parity, so any boundary error at cell resolution breaks
    the oracle match; ``area_within_raster_bound`` cross-checks the
    kernel's exact trapezoid area against the cell count."""
    body = body_rings(spark, sf_dir)
    return _rasterize_parity(union_boundary_rings(body))


@query("geo_union_boundary_hierarchical", oracle=_union_oracle(UNION_MODULUS))
def geo_union_boundary_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed scale path for U7: polygon union as a TWO-LEVEL
    mergeable aggregate. Level 1 unions each (body, bucket)'s rings
    into a partial boundary; level 2 unions the partial boundaries —
    each partial ring set enters as one XOR-group, which is what makes
    the operation associative (module docstring). Same oracle as the
    flat form: the tree and the flat union must enclose the identical
    region. At 100 TB this is the shape that works: every task touches
    a bounded ring set, combines are logarithmic, and no key ever
    needs its full ring list in one place."""
    body = body_rings(spark, sf_dir).withColumn(
        "bucket", (F.floor(F.col("l_orderkey") / UNION_MODULUS) % 3).cast("long")
    )
    partial_schema = _BOUNDARY_SCHEMA + ", bucket long"

    def level1(pdf: pd.DataFrame) -> pd.DataFrame:
        out = _boundary_kernel(pdf, None)
        out["bucket"] = int(pdf["bucket"].iloc[0])
        return out

    partials = body.groupBy("body_id", "bucket").applyInPandas(
        level1, schema=partial_schema
    )
    final = partials.groupBy("body_id").applyInPandas(
        lambda pdf: _boundary_kernel(pdf, "bucket"), schema=_BOUNDARY_SCHEMA
    )
    return _rasterize_parity(final)
