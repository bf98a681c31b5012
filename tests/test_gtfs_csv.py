"""GTFS feed CSV sink/source round trip (S5-S7)."""

import zipfile


class TestGtfsFeedIO:
    def test_write_read_zip_roundtrip(self, spark, tmp_path):
        from pdf2gtfs_spark.sources.gtfs_csv import (
            read_gtfs_feed, write_gtfs_feed,
        )

        stops = spark.createDataFrame(
            [("s1", "Hauptbahnhof, Gleis 1", "48.0", "7.8"),
             ("s2", "Moosweiher", "48.1", "7.9")],
            "stop_id string, stop_name string, stop_lat string, "
            "stop_lon string")
        trips = spark.createDataFrame(
            [("t1", "r1", "svc1")],
            "trip_id string, route_id string, service_id string")
        out = str(tmp_path / "feed")
        zip_path = write_gtfs_feed({"stops": stops, "trips": trips}, out)

        with zipfile.ZipFile(zip_path) as zf:
            assert sorted(zf.namelist()) == ["stops.txt", "trips.txt"]

        back = read_gtfs_feed(spark, out)
        assert set(back) == {"stops", "trips"}
        rows = {r["stop_id"]: r for r in back["stops"].collect()}
        # comma-containing name survives CSV quoting
        assert rows["s1"]["stop_name"] == "Hauptbahnhof, Gleis 1"
        assert back["trips"].count() == 1
