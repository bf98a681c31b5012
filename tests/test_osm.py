"""S8-analog OSM TSV snapshot source + X19 IFOPT validation.

Reference semantics under test: osm_fetcher.py read_data (typed tab
read with '#' comments), validate_ifopt (:293-304), and
remove_entries_without_name (:320-329).
"""

import pytest

from pdf2gtfs_spark.sources.osm_tsv import (
    IFOPT_RE, OSM_COLUMNS, generate_osm_tsv, read_osm_nodes,
)


@pytest.fixture(scope="module")
def tsv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("osm") / "osm_nodes.tsv"
    return generate_osm_tsv(str(p))


class TestGenerator:
    def test_deterministic_bytes(self, tsv_path, tmp_path):
        other = generate_osm_tsv(str(tmp_path / "again.tsv"))
        assert open(tsv_path, "rb").read() == open(other, "rb").read()

    def test_comment_header_layout(self, tsv_path):
        lines = open(tsv_path, encoding="utf-8").read().splitlines()
        assert all(ln.startswith("#") for ln in lines[:4])
        assert lines[4] == "\t".join(OSM_COLUMNS)
        assert len(lines) == 4 + 1 + 400


class TestIfoptRegex:
    import re as _re
    _rx = _re.compile(IFOPT_RE)

    @pytest.mark.parametrize("good", [
        "de:08311:123", "xx:1:a-b:c_3:z", "de:", "ab:x:y",
    ])
    def test_valid(self, good):
        assert self._rx.search(good)

    @pytest.mark.parametrize("bad", [
        "8311:123", "de", "de:1:2:3:4:5", "de:08 311", "d:1:2",
    ])
    def test_invalid(self, bad):
        assert not self._rx.search(bad)


class TestReader:
    def test_drop_unnamed_and_validate(self, spark, tsv_path):
        df = read_osm_nodes(spark, tsv_path)
        rows = df.collect()
        # i%7 in {3, 6} normalize to '' and are dropped: 400 - 114
        assert len(rows) == 286
        assert all(r["names"] != "" for r in rows)
        ifopts = {r["ref_ifopt"] for r in rows}
        assert "" in ifopts                       # blanked invalids
        assert not any(i and ":bad" in i for i in ifopts)
        assert all(i == "" or self_valid(i) for i in ifopts)

    def test_normalization_applied(self, spark, tsv_path):
        names = {r["names"]
                 for r in read_osm_nodes(spark, tsv_path).collect()}
        # Hbf -> hauptbahnhof, word-set sorted
        assert "2 hauptbahnhof tor" in names
        # ß -> ss, Straße -> strasse (no abbreviation hit)
        assert any("grosse strasse" in n for n in names)
        # parentheses stripped, multi-name '|' kept
        assert any("|" in n and "gleis" in n for n in names)

    def test_typed_schema(self, spark, tsv_path):
        df = read_osm_nodes(spark, tsv_path)
        assert dict(df.dtypes)["lat"] == "double"
        assert dict(df.dtypes)["names"] == "string"
        assert tuple(df.columns) == OSM_COLUMNS


def self_valid(ifopt: str) -> bool:
    import re
    return bool(re.search(IFOPT_RE, ifopt))
