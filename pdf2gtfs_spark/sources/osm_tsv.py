"""S8-analog OSM dim snapshot source (reference: locate/osm_fetcher.py).

The reference fetches stop locations from QLever over HTTP as a TSV
export and caches it on disk with '#'-prefixed comment lines carrying
the query fingerprint (osm_fetcher.py:102-151); every later run reads
the cache with a typed tab-separated read (osm_fetcher.py:331-349,
``read_data``: sep='\\t', comment='#', explicit dtypes, header row).

The network fetch is out of scope in this sandbox, so this module is
the *snapshot* half: a deterministic generator standing in for one
QLever TSV export, and a Spark reader with the same typed schema,
comment handling, name normalization (utils.py normalize_series),
IFOPT validation (osm_fetcher.py:293-304, X19) and empty-name drop
(osm_fetcher.py:320-329).

Scale shape: the OSM node dim is a few million rows (small vs the
fact table) — read once, normalized with built-in column functions
(stays in WholeStageCodegen), then broadcast into the J6 name-cost
join (operators/locate.py).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf2gtfs_spark.config import DEFAULT_CONFIG, ExtractConfig
from pdf2gtfs_spark.functions.normalize import normalize_col

# column layout of the reference's TSV cache: KEYS + CAT_KEYS +
# OSMNode.optional_tags + ('names',)  (osm_fetcher.py:21-25,
# finder/loc_nodes.py:61)
OSM_KEYS = ("lat", "lon", "public_transport")
OSM_CAT_KEYS = ("railway", "bus", "tram", "train", "subway",
                "monorail", "light_rail")
OSM_OPTIONAL_TAGS = ("ref_ifopt", "wheelchair", "gtfs_name")
OSM_COLUMNS = OSM_KEYS + OSM_CAT_KEYS + OSM_OPTIONAL_TAGS + ("names",)

OSM_SCHEMA = ", ".join(
    [f"{c} double" if c in ("lat", "lon") else f"{c} string"
     for c in OSM_COLUMNS])

# exact expansion of the reference's validate_ifopt regex
# (osm_fetcher.py:293-304): 2 letters, then 1-5 ':'-separated
# [\w-]* parts.
_PART = r":[\w\-]*"
IFOPT_RE = (rf"^[a-zA-Z]{{2}}{_PART}"
            rf"(?:{_PART}(?:{_PART}(?:{_PART}){{0,1}}){{0,1}}){{0,1}}$")

# number of '#' comment lines the generator writes (the reference
# writes get_osm_comments() — query fingerprint + date — before the
# data; osm_fetcher.py:373-396). DuckDB 1.0 has no comment= option,
# so the oracle skips exactly this many lines.
N_COMMENT_LINES = 4

_PT_VALUES = ("stop_position", "platform", "station")
_WHEELCHAIR = ("yes", "no", "limited", "")


def _row(i: int) -> list[str]:
    lat = 47.0 + i * 0.003
    lon = 7.0 + (i * i % 997) * 0.001
    names = {
        0: f"Gleis {i} (Süd)|Bahnhofplatz {i % 5}",
        1: f"Hbf Tor {i % 9}",
        2: f"Große Straße {i % 11}",
        3: "",
        4: f"St. Peter {i % 13}",
        5: f"Markt {i % 17}|Markt {i % 17}",
        6: f"({i})",
    }[i % 7]
    ifopt = {
        0: f"de:{i:05d}:{i % 97}",
        1: f"xx:{i}:a-b:c_{i % 7}:z",
        2: f"{i}:bad",
        3: f"de:1:2:3:4:{i}",
        4: "",
    }[i % 5]
    return [f"{lat:.3f}", f"{lon:.3f}", _PT_VALUES[i % 3],
            "yes" if i % 2 == 0 else "",              # railway
            "yes" if i % 3 == 0 else "",              # bus
            "yes" if i % 5 == 0 else "",              # tram
            "", "", "",                               # train/subway/monorail
            "yes" if i % 7 == 0 else "",              # light_rail
            ifopt, _WHEELCHAIR[i % 4],
            f"G{i}" if i % 6 == 0 else "", names]


def generate_osm_tsv(path: str, n: int = 400) -> str:
    """Write the deterministic synthetic QLever-TSV snapshot (atomic,
    idempotent — same bytes every call)."""
    dest = Path(path)
    dest.parent.mkdir(parents=True, exist_ok=True)
    lines = ["# qlever query fingerprint: synthetic-dim-v1",
             "# endpoint: (offline snapshot)",
             "# columns: " + ",".join(OSM_COLUMNS),
             "#"]
    assert len(lines) == N_COMMENT_LINES
    lines.append("\t".join(OSM_COLUMNS))
    lines.extend("\t".join(_row(i)) for i in range(n))
    data = "\n".join(lines) + "\n"
    tmp = dest.with_name(f".{dest.name}.tmp.{os.getpid()}")
    tmp.write_text(data, encoding="utf-8")
    os.replace(tmp, dest)
    return str(dest)


def validate_ifopt_col(col) -> F.Column:
    """X19: blank IFOPTs that fail the reference regex
    (osm_fetcher.py:293-304). Null-safe: missing -> ''."""
    c = F.coalesce(col, F.lit(""))
    return F.when(c.rlike(IFOPT_RE), c).otherwise(F.lit(""))


def read_osm_nodes(spark: SparkSession, path: str,
                   cfg: ExtractConfig = DEFAULT_CONFIG) -> DataFrame:
    """S8 snapshot read: typed tab-separated scan with '#' comments
    (osm_fetcher.py:331-349), then the reference's
    raw_osm_data_to_dataframe pipeline (names normalized, IFOPTs
    validated, empty-name rows dropped; osm_fetcher.py:307-329) —
    all built-in column functions, no UDF."""
    raw = (spark.read
           .options(sep="\t", header=True, comment="#")
           .schema(OSM_SCHEMA)
           .csv(path))
    return (raw
            .withColumn("names",
                        normalize_col(F.coalesce("names", F.lit("")), cfg))
            .withColumn("ref_ifopt", validate_ifopt_col(F.col("ref_ifopt")))
            .where(F.col("names") != ""))
