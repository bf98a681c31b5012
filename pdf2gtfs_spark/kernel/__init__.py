"""Pure (Spark-free) vectorized extraction kernel.

Runs per turn-batch inside Arrow-batched ``mapInPandas``; every function
here operates on pandas/numpy frames, never per-row Python over Spark
rows. Semantics mirror the reference's legacy extraction path, which is
the columnar blueprint (reference: src/pdf2gtfs/reader.py:349-383,
datastructures/pdftable/*).
"""

from pdf2gtfs_spark.kernel.extract import extract_turn, TurnResult  # noqa: F401
from pdf2gtfs_spark.kernel.payload import (  # noqa: F401
    decode_payload, encode_chars, encode_grid,
)
