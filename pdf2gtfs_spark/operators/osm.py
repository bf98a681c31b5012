"""S8-analog OSM snapshot queries + X19 IFOPT validation.

Driver-oracle coverage for the last two SURVEY §2 rows:
- S8 (osm_fetcher.py:102-151, 331-349): the QLever fetch is network
  and out of scope, but its on-disk contract — a '#'-commented typed
  TSV snapshot — is read here with ``spark.read.csv`` and pushed
  through the reference's post-fetch pipeline (normalize names,
  validate IFOPTs, drop unnamed rows). The DuckDB oracle re-reads the
  same TSV bytes and recomputes every transformation in SQL.
- X19 (osm_fetcher.py:293-304): the IFOPT validation regex as rlike.

The composed `osm_locate_name_cost` then feeds the snapshot into the
J6 name-containment join + name_cost, i.e. the reference's
locate/__init__.py flow with the OSM dim coming from the S8 reader
instead of a hand-built frame.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf2gtfs_spark.config import DEFAULT_CONFIG
from pdf2gtfs_spark.functions.normalize import _forbidden_chars_regex
from pdf2gtfs_spark.operators import register
from pdf2gtfs_spark.operators._aux import aux_path
from pdf2gtfs_spark.sources.osm_tsv import (IFOPT_RE, N_COMMENT_LINES,
                                            OSM_COLUMNS, generate_osm_tsv,
                                            read_osm_nodes,
                                            validate_ifopt_col)

_OSM_TSV = aux_path("osm_nodes.tsv")

# DuckDB-side typed read of the same TSV (DuckDB 1.0 has no comment=
# option -> skip the N fixed comment lines, then the header row).
_READ_COLS = ", ".join(
    f"'{c}': '{'DOUBLE' if c in ('lat', 'lon') else 'VARCHAR'}'"
    for c in OSM_COLUMNS)
_READ_SQL = (f"read_csv('{_OSM_TSV}', delim='\t', header=true, "
             f"skip={N_COMMENT_LINES}, columns={{{_READ_COLS}}})")


def _norm_sql(expr: str) -> str:
    """DuckDB expression mirroring functions/normalize.normalize_col:
    lower -> ß/ss -> abbreviation chain (same key order) -> forbidden
    chars -> per-'|' word-set sort/dedup."""
    s = f"replace(lower({expr}), 'ß', 'ss')"
    for key, full in DEFAULT_CONFIG.name_abbreviations.items():
        if key.endswith("."):
            base = key[:-1]
            pat = rf"(\b{base}\.)|(\b{base}\b)|({base}\.)"
        else:
            pat = rf"(\b{key}\.)|(\b{key}\b)"
        s = f"regexp_replace({s}, '{pat}', '{full}', 'g')"
    forbidden = _forbidden_chars_regex(DEFAULT_CONFIG.allowed_stop_chars)
    s = f"regexp_replace({s}, '{forbidden}', ' ', 'g')"
    return ("array_to_string(list_transform(string_split(" + s + ", '|'), "
            "n -> array_to_string(list_sort(list_distinct(list_filter("
            "string_split_regex(trim(n), ' +'), w -> w <> ''))), ' ')), "
            "'|')")


_IFOPT_SQL = ("CASE WHEN regexp_matches(coalesce(ref_ifopt, ''), "
              f"'{IFOPT_RE}') THEN ref_ifopt ELSE '' END")

_NODES_CTE = f"""
nodes AS (
  SELECT CAST(round(lat * 1000) AS BIGINT) AS lat_i,
         CAST(round(lon * 1000) AS BIGINT) AS lon_i,
         coalesce(public_transport, '') AS public_transport,
         coalesce(railway, '') AS railway,
         coalesce(bus, '') AS bus,
         {_IFOPT_SQL} AS ref_ifopt,
         coalesce(wheelchair, '') AS wheelchair,
         coalesce(gtfs_name, '') AS gtfs_name,
         {_norm_sql("coalesce(names, '')")} AS names
  FROM {_READ_SQL}
)"""


@register("osm_tsv_snapshot", oracle=f"""
WITH {_NODES_CTE}
SELECT * FROM nodes WHERE names <> '' ORDER BY lat_i
""")
def osm_tsv_snapshot(spark, sf_dir):
    """S8 snapshot read end-to-end (typed TSV scan -> normalize ->
    validate -> drop unnamed), integer-ized coordinates for the
    value-hash compare."""
    generate_osm_tsv(_OSM_TSV)
    nodes = read_osm_nodes(spark, _OSM_TSV)
    return (nodes.select(
                F.round(F.col("lat") * 1000).cast("bigint").alias("lat_i"),
                F.round(F.col("lon") * 1000).cast("bigint").alias("lon_i"),
                *[F.coalesce(c, F.lit("")).alias(c)
                  for c in ("public_transport", "railway", "bus")],
                "ref_ifopt",
                *[F.coalesce(c, F.lit("")).alias(c)
                  for c in ("wheelchair", "gtfs_name")],
                "names")
            .orderBy("lat_i"))


@register("osm_ifopt_validation", oracle=f"""
SELECT CAST(round(lat * 1000) AS BIGINT) AS lat_i,
       coalesce(ref_ifopt, '') AS raw_ifopt,
       {_IFOPT_SQL} AS valid_ifopt,
       {_IFOPT_SQL} <> '' AS is_valid
FROM {_READ_SQL}
ORDER BY lat_i
""")
def osm_ifopt_validation(spark, sf_dir):
    """X19: the IFOPT regex over the raw snapshot (before the
    name-drop filter, mirroring validate_ifopt's position in
    raw_osm_data_to_dataframe)."""
    generate_osm_tsv(_OSM_TSV)
    from pdf2gtfs_spark.sources.osm_tsv import OSM_SCHEMA
    raw = (spark.read.options(sep="\t", header=True, comment="#")
           .schema(OSM_SCHEMA).csv(_OSM_TSV))
    valid = validate_ifopt_col(F.col("ref_ifopt"))
    return (raw.select(
                F.round(F.col("lat") * 1000).cast("bigint").alias("lat_i"),
                F.coalesce("ref_ifopt", F.lit("")).alias("raw_ifopt"),
                valid.alias("valid_ifopt"),
                (valid != "").alias("is_valid"))
            .orderBy("lat_i"))


@register("osm_locate_name_cost", oracle=f"""
WITH {_NODES_CTE},
named AS (SELECT * FROM nodes WHERE names <> ''),
stops AS (
  SELECT * FROM (VALUES
    (0, '3 markt'), (1, '5 peter sankt'), (2, '2 hauptbahnhof tor'),
    (3, '1 bahnhofplatz'), (4, '7 grosse strasse'))
    AS t(stop_id, stop_name)
)
SELECT s.stop_id, n.lat_i AS node_lat_i,
       abs(length(replace(s.stop_name, ' ', ''))
           - length(replace(n.names, ' ', ''))) AS name_cost
FROM stops s JOIN named n
  ON regexp_matches(n.names, concat('\\b', s.stop_name, '\\b'))
ORDER BY stop_id, node_lat_i
""")
def osm_locate_name_cost(spark, sf_dir):
    """S8 -> J6 composition: the snapshot dim broadcast into the
    name-containment join with per-pair name_cost
    (locate/__init__.py:152-175). The stop names are pre-normalized
    literals, as the reference normalizes GTFS stop names before the
    join."""
    generate_osm_tsv(_OSM_TSV)
    nodes = read_osm_nodes(spark, _OSM_TSV).select(
        F.round(F.col("lat") * 1000).cast("bigint").alias("node_lat_i"),
        "names")
    stops = spark.createDataFrame(
        [(0, "3 markt"), (1, "5 peter sankt"), (2, "2 hauptbahnhof tor"),
         (3, "1 bahnhofplatz"), (4, "7 grosse strasse")],
        "stop_id int, stop_name string")
    joined = nodes.join(
        F.broadcast(stops),
        F.expr(r"names rlike concat('\\b', stop_name, '\\b')"))
    return (joined.select(
                "stop_id", "node_lat_i",
                F.abs(F.length(F.regexp_replace("stop_name", " ", ""))
                      - F.length(F.regexp_replace("names", " ", "")))
                .alias("name_cost"))
            .orderBy("stop_id", "node_lat_i"))
