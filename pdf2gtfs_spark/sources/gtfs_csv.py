"""GTFS feed CSV sink/source (SURVEY.md §2.1 S5-S7).

- ``write_gtfs_feed``: one CSV per GTFS table written distributed
  (coalesced per table — GTFS files are small relative to the input),
  then zipped driver-side into feed.zip, mirroring the reference's
  writer+zip (gtfs_output/__init__.py:106-121, handler.py:266-310).
- ``read_gtfs_feed``: header-aware all-string reads like the
  reference's ``pd.read_csv(dtype=str, keep_default_na=False)``
  (gtfs_output/__init__.py:59-69).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

GTFS_SCHEMAS = {
    # FIXTURES.md §6 (dataclass fields in the reference)
    "agency": "agency_id string, agency_name string, agency_url string, "
              "agency_timezone string",
    "stops": "stop_id string, stop_name string, stop_lat string, "
             "stop_lon string",
    "routes": "route_id string, agency_id string, route_short_name string, "
              "route_long_name string, route_type string",
    "trips": "trip_id string, route_id string, service_id string",
    "stop_times": "trip_id string, arrival_time string, "
                  "departure_time string, stop_id string, "
                  "stop_sequence string",
    "calendar": "service_id string, monday string, tuesday string, "
                "wednesday string, thursday string, friday string, "
                "saturday string, sunday string, start_date string, "
                "end_date string",
    "calendar_dates": "service_id string, date string, "
                      "exception_type string",
}


def write_gtfs_feed(dfs: dict, out_dir: str,
                    zip_name: str = "feed.zip") -> str:
    """Write each table as <name>.txt (GTFS CSV) + zip the feed.

    ``dfs``: {table_name: DataFrame}. Tables are coalesced to a single
    file each — GTFS output is dimension-sized next to the input, so a
    single writer task per table is the right plan even at 100 TB
    input scale.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    txt_paths = []
    for name, df in dfs.items():
        tmp = out / f"_{name}_csv"
        (df.coalesce(1).write.mode("overwrite")
         .option("header", True).option("emptyValue", "")
         .csv(str(tmp)))
        part = next(Path(tmp).glob("part-*.csv"))
        target = out / f"{name}.txt"
        part.replace(target)
        for leftover in Path(tmp).glob("*"):
            leftover.unlink()
        Path(tmp).rmdir()
        txt_paths.append(target)
    zip_path = out / zip_name
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(txt_paths):
            zf.write(p, arcname=p.name)
    return str(zip_path)


def read_gtfs_feed(spark, feed_dir: str) -> dict:
    """Read every known GTFS .txt present in feed_dir, all-string."""
    dfs = {}
    for name, schema in GTFS_SCHEMAS.items():
        p = Path(feed_dir) / f"{name}.txt"
        if not p.exists():
            continue
        dfs[name] = (spark.read
                     .option("header", True)
                     .schema(schema)
                     .csv(str(p)))
    return dfs
