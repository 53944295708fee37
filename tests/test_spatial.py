"""Spatial pack tests (reference test/spatial/ + test/execute/execute.spatial
fixtures: WKT round trips, point/polygon relations, predicate matrix)."""

import pytest

from squirreling_spark.functions.spatial import (
    contains,
    covers,
    crosses,
    distance,
    dwithin,
    equals,
    intersects,
    make_envelope,
    overlaps,
    parse_wkt,
    to_wkt,
    touches,
    within,
)

SQUARE = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
SMALL = parse_wkt("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
DISJOINT = parse_wkt("POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))")
EDGE_SHARED = parse_wkt("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")
OVERLAP = parse_wkt("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
HOLEY = parse_wkt(
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 3))"
)


class TestWkt:
    @pytest.mark.parametrize(
        "wkt",
        [
            "POINT (1 2)",
            "MULTIPOINT ((1 2), (3 4))",
            "LINESTRING (0 0, 1 1, 2 0)",
            "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 2))",
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
            "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
        ],
    )
    def test_roundtrip(self, wkt):
        assert to_wkt(parse_wkt(wkt)) == wkt

    def test_geojson_passthrough(self):
        g = parse_wkt('{"type": "Point", "coordinates": [1.0, 2.0]}')
        assert g["type"] == "Point"

    def test_invalid(self):
        with pytest.raises(ValueError):
            parse_wkt("NOT A GEOM")


class TestPredicates:
    def test_contains_within(self):
        assert contains(SQUARE, SMALL)
        assert within(SMALL, SQUARE)
        assert not contains(SMALL, SQUARE)
        assert not contains(SQUARE, DISJOINT)

    def test_contains_point(self):
        pt_in = parse_wkt("POINT (5 5)")
        pt_boundary = parse_wkt("POINT (0 5)")
        pt_out = parse_wkt("POINT (11 5)")
        assert contains(SQUARE, pt_in)
        assert contains(SQUARE, pt_boundary)
        assert not contains(SQUARE, pt_boundary, proper=True)
        assert not contains(SQUARE, pt_out)

    def test_hole(self):
        inside_hole = parse_wkt("POINT (5 4)")
        in_solid = parse_wkt("POINT (1 1)")
        assert not contains(HOLEY, inside_hole)
        assert contains(HOLEY, in_solid)

    def test_intersects(self):
        assert intersects(SQUARE, SMALL)
        assert intersects(SQUARE, OVERLAP)
        assert intersects(SQUARE, EDGE_SHARED)  # shared edge counts
        assert not intersects(SQUARE, DISJOINT)
        line = parse_wkt("LINESTRING (-5 5, 15 5)")
        assert intersects(SQUARE, line)

    def test_overlaps(self):
        assert overlaps(SQUARE, OVERLAP)
        assert not overlaps(SQUARE, SMALL)  # containment is not overlap
        assert not overlaps(SQUARE, DISJOINT)
        line = parse_wkt("LINESTRING (-5 5, 15 5)")
        assert not overlaps(SQUARE, line)  # dim mismatch

    def test_touches(self):
        assert touches(SQUARE, EDGE_SHARED)
        assert not touches(SQUARE, OVERLAP)
        assert not touches(SQUARE, DISJOINT)
        corner_pt = parse_wkt("POINT (10 10)")
        assert touches(SQUARE, corner_pt)

    def test_equals(self):
        same = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        assert equals(SQUARE, same)
        assert not equals(SQUARE, SMALL)

    def test_crosses(self):
        l1 = parse_wkt("LINESTRING (0 0, 10 10)")
        l2 = parse_wkt("LINESTRING (0 10, 10 0)")
        parallel = parse_wkt("LINESTRING (0 1, 10 11)")
        assert crosses(l1, l2)
        assert not crosses(l1, parallel)
        line_through = parse_wkt("LINESTRING (-5 5, 15 5)")
        assert crosses(line_through, SQUARE)

    def test_covers_approximation(self):
        # reference approximates covers≈contains (spatial.js:60-61)
        assert covers(SQUARE, SMALL) == contains(SQUARE, SMALL)

    def test_distance_dwithin(self):
        a = parse_wkt("POINT (0 0)")
        b = parse_wkt("POINT (3 4)")
        assert distance(a, b) == pytest.approx(5.0)
        assert dwithin(a, b, 5.0)
        assert not dwithin(a, b, 4.9)
        assert distance(SQUARE, SMALL) == 0.0
        assert distance(SQUARE, DISJOINT) == pytest.approx(
            ((10.0) ** 2 + 10.0**2) ** 0.5
        )

    def test_make_envelope(self):
        env = make_envelope(0, 0, 10, 10)
        assert equals(env, SQUARE)


class TestSparkIntegration:
    def test_sql_predicates(self, spark):
        from squirreling_spark.functions.spatial import register_spatial

        register_spatial(spark)
        df = spark.createDataFrame(
            [
                ("a", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POINT (5 5)"),
                ("b", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POINT (15 5)"),
            ],
            ["id", "poly", "pt"],
        )
        df.createOrReplaceTempView("geoms")
        rows = spark.sql(
            """
            SELECT id, st_contains(poly, pt) AS c, st_intersects(poly, pt) AS i,
                   st_distance(poly, pt) AS d,
                   st_astext(pt) AS wkt
            FROM geoms ORDER BY id
            """
        ).collect()
        assert [r["c"] for r in rows] == [True, False]
        assert rows[1]["d"] == pytest.approx(5.0)
        assert rows[0]["wkt"] == "POINT (5 5)"


def test_spatial_join_matches_brute_force(spark):
    """Grid-banded spatial_join (operators/spatial_join.py) must emit
    exactly the pairs the row-wise predicate accepts — once each, however
    many grid cells a bbox spans (multi-cell bboxes exercise the
    first-shared-cell dedup), including triangles (bbox overlap is
    necessary-not-sufficient: the exact predicate must kill bbox-only
    candidates)."""
    import random

    from squirreling_spark.functions.spatial import _PREDICATES, parse_wkt
    from squirreling_spark.operators.spatial_join import spatial_join

    rng = random.Random(20260814)
    pts = []
    for i in range(60):
        x = round(rng.uniform(-10, 10), 3)
        y = round(rng.uniform(-10, 10), 3)
        pts.append((i, f"POINT ({x} {y})"))
    polys = []
    for j in range(20):
        x0 = round(rng.uniform(-10, 6), 3)
        y0 = round(rng.uniform(-10, 6), 3)
        w = round(rng.uniform(0.5, 7), 3)   # spans multiple 2.0-cells
        h = round(rng.uniform(0.5, 7), 3)
        if j % 3 == 0:  # triangle: bbox overlap != containment
            wkt = (
                f"POLYGON (({x0} {y0}, {x0 + w} {y0}, "
                f"{x0} {y0 + h}, {x0} {y0}))"
            )
        else:
            wkt = (
                f"POLYGON (({x0} {y0}, {x0 + w} {y0}, {x0 + w} {y0 + h}, "
                f"{x0} {y0 + h}, {x0} {y0}))"
            )
        polys.append((j, wkt))

    fn = _PREDICATES["st_intersects"]
    expected = {
        (pid, gid)
        for pid, pw in pts
        for gid, gw in polys
        if fn(parse_wkt(pw), parse_wkt(gw))
    }
    assert expected  # non-vacuous

    l_df = spark.createDataFrame(pts, "pt_id int, pt_wkt string")
    r_df = spark.createDataFrame(polys, "poly_id int, poly_wkt string")
    got = {
        (r["pt_id"], r["poly_id"])
        for r in spatial_join(
            l_df, r_df, "pt_wkt", "poly_wkt",
            predicate="st_intersects", cell_size=2.0,
        ).collect()
    }
    assert got == expected

    # polygon-vs-polygon: candidate pairs can share MANY cells; each
    # surviving pair must still appear exactly once
    r2 = [(100 + j, w) for j, w in polys[:10]]
    r2_df = spark.createDataFrame(r2, "poly2_id int, poly2_wkt string")
    rows = spatial_join(
        r_df, r2_df, "poly_wkt", "poly2_wkt",
        predicate="st_intersects", cell_size=2.0,
    ).collect()
    pairs = [(r["poly_id"], r["poly2_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))  # exactly-once emission
    expected2 = {
        (gid, gid2)
        for gid, gw in polys
        for gid2, gw2 in r2
        if fn(parse_wkt(gw), parse_wkt(gw2))
    }
    assert set(pairs) == expected2


def test_spatial_dwithin_join_matches_brute_force(spark):
    """Distance join (padded-bbox grid candidates + exact distance on
    candidates) must match the brute-force all-pairs dwithin — including
    radius > cell_size (candidates from beyond the adjacent cell ring)."""
    import random

    from squirreling_spark.functions.spatial import dwithin, parse_wkt
    from squirreling_spark.operators.spatial_join import spatial_join

    rng = random.Random(77)
    a = [(i, f"POINT ({round(rng.uniform(-8, 8), 3)} "
             f"{round(rng.uniform(-8, 8), 3)})") for i in range(50)]
    b = [(j, f"POINT ({round(rng.uniform(-8, 8), 3)} "
             f"{round(rng.uniform(-8, 8), 3)})") for j in range(30)]
    for dist, cell in ((2.0, 2.0), (3.5, 1.5)):
        expected = {
            (ia, ib)
            for ia, wa in a
            for ib, wb in b
            if dwithin(parse_wkt(wa), parse_wkt(wb), dist)
        }
        assert expected
        l_df = spark.createDataFrame(a, "a_id int, a_wkt string")
        r_df = spark.createDataFrame(b, "b_id int, b_wkt string")
        got = {
            (r["a_id"], r["b_id"])
            for r in spatial_join(
                l_df, r_df, "a_wkt", "b_wkt",
                predicate="st_dwithin", cell_size=cell, distance=dist,
            ).collect()
        }
        assert got == expected, (dist, cell)
