"""Exact union-boundary kernel tests (operators/clipping.py).

Three layers: (1) hand-built geometry with known areas/ring counts,
(2) a randomized region-equivalence property — the boundary's total
crossing parity must reproduce the brute-force inside-any-input test
at off-edge probe points, (3) fixture-data guards: the no-tie margin
that keeps the rasterized oracle compare deterministic, and exact
flat-vs-hierarchical agreement (associativity on real data).
"""

from __future__ import annotations

import itertools
import random
from fractions import Fraction as Fr

import duckdb
import pytest

from tests.conftest import SF_ORACLE, SF_SMOKE

from lake_satellite_image_etl_spark.operators.clipping import (
    QUANT,
    UNION_EDGE_CAP,
    UNION_MODULUS,
    _frac,
    union_boundary,
)


def FR(pts):
    return [(Fr(x), Fr(y)) for x, y in pts]


def sq(x0, y0, x1, y1):
    return FR([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])


def _close(ring):
    return list(ring) + ([ring[0]] if ring[0] != ring[-1] else [])


def parity_inside(rings, px, py):
    """Total crossing parity across all boundary rings (the output
    contract: one XOR-group)."""
    cnt = 0
    for r in rings:
        for (x1, y1), (x2, y2) in zip(r, r[1:]):
            if (y1 > py) != (y2 > py):
                if px < x1 + (x2 - x1) * (py - y1) / (y2 - y1):
                    cnt += 1
    return cnt % 2 == 1


def brute_inside_any(groups, px, py):
    """Reference semantics: inside ANY group, each group an even-odd
    XOR of its rings."""
    for g in groups:
        c = 0
        for ring in g:
            for (x1, y1), (x2, y2) in zip(_close(ring), _close(ring)[1:]):
                if (y1 > py) != (y2 > py):
                    if px < x1 + (x2 - x1) * (py - y1) / (y2 - y1):
                        c += 1
        if c % 2:
            return True
    return False


HAND_CASES = [
    # (name, groups, exact area, expected ring count or None)
    ("overlap_squares", [[sq(0, 0, 2, 2)], [sq(1, 1, 3, 3)]], Fr(7), 1),
    ("annulus_xor_group", [[sq(0, 0, 4, 4), sq(1, 1, 2, 2)]], Fr(15), 2),
    ("bowtie_self_intersecting", [[FR([(0, 0), (2, 2), (2, 0), (0, 2)])]], Fr(2), 2),
    ("disjoint", [[sq(0, 0, 1, 1)], [sq(5, 5, 6, 6)]], Fr(2), 2),
    ("exact_duplicates", [[sq(0, 0, 2, 2)], [sq(0, 0, 2, 2)]], Fr(4), 1),
    ("nested_containment", [[sq(0, 0, 4, 4)], [sq(1, 1, 2, 2)]], Fr(16), 1),
    (
        "rectilinear_comb",  # vertical-edge heavy
        [[sq(i, 0, Fr(2 * i + 1, 2), 3)] for i in range(4)]
        + [[sq(0, 0, 4, Fr(1, 2))]],
        Fr(7),
        1,
    ),
    (
        "shared_edge_seam",  # adjacent squares: interior seam must vanish
        [[sq(0, 0, 1, 2)], [sq(1, 0, 2, 2)]],
        Fr(4),
        1,
    ),
]


@pytest.mark.parametrize("name,groups,want_area,want_rings", HAND_CASES)
def test_hand_geometry(name, groups, want_area, want_rings):
    rings, area, perim = union_boundary(groups)
    assert area == want_area, name
    if want_rings is not None:
        assert len(rings) == want_rings, name
    for r in rings:
        assert r[0] == r[-1] and len(r) >= 4, f"{name}: unclosed/degenerate ring"
    assert perim > 0


def test_seam_removal_perimeter():
    """Two adjacent squares: the union ring is the outer 2x2 square —
    seam edges must not survive into the boundary."""
    rings, area, perim = union_boundary([[sq(0, 0, 1, 2)], [sq(1, 0, 2, 2)]])
    assert perim == pytest.approx(8.0)
    assert len(rings[0]) == 5  # 4 corners + closure: seam vertices merged


def test_region_equivalence_random():
    """Property: for random messy (self-intersecting, vertical-edge,
    duplicate-point) rings on the data's coordinate grid, the boundary
    reconstructs exactly the brute-force region at off-edge probes."""
    rng = random.Random(7)

    def rand_ring(n=6, scale=10):
        return FR(
            [
                (rng.randint(0, scale), Fr(rng.randint(0, 100 * scale), 100))
                for _ in range(n)
            ]
        )

    rings_in = [rand_ring() for _ in range(9)]
    groups = [[r] for r in rings_in]
    out, area, _ = union_boundary(groups)
    assert area > 0
    for i, j in itertools.product(range(0, 61, 2), range(0, 61, 2)):
        px, py = Fr(i, 10) - Fr(1, 7), Fr(j, 10) - Fr(1, 11)
        assert brute_inside_any(groups, px, py) == parity_inside(out, px, py), (
            px,
            py,
        )


def test_associativity_exact():
    """Tree union == flat union, exactly (area and region): the output
    ring set re-enters as one XOR-group, making union a mergeable
    combine — the 100 TB distribution property."""
    rng = random.Random(11)

    def rand_ring(n=6, scale=10):
        return FR(
            [
                (rng.randint(0, scale), Fr(rng.randint(0, 100 * scale), 100))
                for _ in range(n)
            ]
        )

    rings_in = [rand_ring() for _ in range(9)]
    flat, a_flat, _ = union_boundary([[r] for r in rings_in])
    p1, _, _ = union_boundary([[r] for r in rings_in[:3]])
    p2, _, _ = union_boundary([[r] for r in rings_in[3:6]])
    p3, _, _ = union_boundary([[r] for r in rings_in[6:]])
    tree, a_tree, _ = union_boundary([p1, p2, p3])
    assert a_flat == a_tree
    for i, j in itertools.product(range(0, 61, 3), range(0, 61, 3)):
        px, py = Fr(i, 10) - Fr(1, 13), Fr(j, 10) - Fr(1, 17)
        assert parity_inside(flat, px, py) == parity_inside(tree, px, py)


def test_degenerate_inputs():
    # zero-area out-and-back "ring" unions to nothing
    rings, area, _ = union_boundary([[FR([(0, 0), (3, 3), (0, 0)])]])
    assert rings == [] and area == 0
    # and vanishes inside a union with a real polygon
    rings, area, _ = union_boundary([[FR([(0, 0), (3, 3), (0, 0)])], [sq(0, 0, 1, 1)]])
    assert area == 1 and len(rings) == 1


def test_edge_cap_raises():
    many = [[sq(i, 0, i + 1, 1)] for i in range(UNION_EDGE_CAP // 2 + 1)]
    with pytest.raises(ValueError, match="UNION_EDGE_CAP"):
        union_boundary(many)


# ---------------------------------------------------------------------------
# fixture-data guards (kernel-level, no Spark session needed)
# ---------------------------------------------------------------------------


def _fixture_bodies(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH geom AS (
            SELECT (l_orderkey // {UNION_MODULUS}) % 5 AS body_id, l_orderkey,
                   array_agg([(l_quantity % 30)::DOUBLE,
                              ((l_extendedprice % 3000) / 100)::DOUBLE]
                             ORDER BY l_linenumber, l_quantity, l_extendedprice) AS pts
            FROM '{sf_dir}/lineitem.parquet'
            WHERE l_orderkey % {UNION_MODULUS} = 0 GROUP BY l_orderkey)
        SELECT body_id, pts || [pts[1]] FROM geom
        """
    ).fetchall()
    bodies: dict[int, list] = {}
    for bid, ring in rows:
        bodies.setdefault(bid, []).append([(_frac(x), _frac(y)) for x, y in ring])
    return bodies


#: exact clearance every 30x30 cell center must keep from every input
#: and output edge, in both ray-cast decision directions. Quantization
#: moves edges < 2^-21 ≈ 5e-7 and float evaluation < ~1e-12, so any
#: margin ≥ 1e-5 makes the rasterized oracle compare tie-free.
TIE_MARGIN = Fr(1, 100_000)


def _assert_no_ties(edge_rings):
    centers = [Fr(2 * k + 1, 2) for k in range(30)]
    for ring in edge_rings:
        pts = _close(ring)
        for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
            if x1 != x2:
                lo, hi = min(x1, x2), max(x1, x2)
                for cx in centers:
                    if lo < cx < hi:
                        y = y1 + (y2 - y1) * (cx - x1) / (x2 - x1)
                        for cy in centers:
                            assert abs(y - cy) > TIE_MARGIN
            if y1 != y2:
                lo, hi = min(y1, y2), max(y1, y2)
                for cy in centers:
                    if lo < cy < hi:
                        x = x1 + (x2 - x1) * (cy - y1) / (y2 - y1)
                        for cx in centers:
                            assert abs(x - cx) > TIE_MARGIN


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_fixture_raster_compare_is_tie_free(sf_dir):
    """The driver compare hashes union_cells computed from OUTPUT
    rings (Spark, float) against INPUT rings (DuckDB, float). That is
    deterministic only if no grid center sits on a knife edge of
    either ring set — pinned here exactly, with margin."""
    for bid, rings in _fixture_bodies(sf_dir).items():
        _assert_no_ties(rings)
        out, _, _ = union_boundary([[r] for r in rings])
        _assert_no_ties(out)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_fixture_flat_equals_hierarchical_exact(sf_dir):
    """Associativity on real fixture rings: bucketed partial unions
    recombined must give the identical exact area (stronger than the
    cell-level oracle equality)."""
    for bid, rings in _fixture_bodies(sf_dir).items():
        _, a_flat, _ = union_boundary([[r] for r in rings])
        parts = [
            union_boundary([[r] for r in rings[b::3]])[0] for b in range(3)
        ]
        _, a_tree, _ = union_boundary([g for g in parts if g] or [[]])
        assert a_flat == a_tree, bid


def test_quant_grid_is_binary():
    """QUANT must stay a power of two: _frac snaps floats to exact
    binary multiples so float(Fraction) round-trips losslessly."""
    assert QUANT & (QUANT - 1) == 0
    assert _frac(10.5) == Fr(21, 2)
    assert float(_frac(0.1)) == pytest.approx(0.1, abs=1e-6)
