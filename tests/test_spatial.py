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
