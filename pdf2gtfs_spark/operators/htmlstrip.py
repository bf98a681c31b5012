"""HTML boilerplate-strip operator (north_rule "HTML boilerplate
strip, ... DOM heuristics" leg) over the documents table.

``html_main_content`` wraps each document's raw text into a
deterministic boilerplate page (kernel/htmlstrip.py::wrap_document:
header/nav/sidebar/ad/comments/footer skeleton + the content split
into fixed-width entity-escaped <p> chunks), then runs the real DOM
extractor (stdlib html.parser + Readability-style heuristics) through
``mapInPandas``.  The DuckDB oracle never parses HTML: it predicts the
extractor's exact output from the raw text alone — title, per-chunk
trim, the 25-char length rule, and the fixed 9-block boilerplate count
— so a drift in the parser, the block model, or any heuristic breaks
the value hash.

Portability contract with the oracle:
- chunking: fixed CHUNK-char substrings (both engines index by code
  point; inputs are ASCII);
- block text is whitespace-stripped on emission -> oracle trims with
  ' \\t\\n\\r' (the inputs contain no exotic whitespace);
- the length rule applies to the STRIPPED text;
- boilerplate blocks per page = N_BOILERPLATE_BLOCKS (template
  constant), all dropped by marker/ancestor/link-density rules.

Scale: map-only over the documents scan (no shuffle before the
kernel); the final orderBy exists only for the deterministic oracle
comparison.  At 100 TB the real input would already be HTML — the
wrapper is the sandbox synthesis seam, the extractor is the product.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pdf2gtfs_spark.kernel.htmlstrip import (
    CHUNK, MIN_BLOCK_CHARS, N_BOILERPLATE_BLOCKS, strip_html,
    wrap_document,
)
from pdf2gtfs_spark.operators import read_scaled, register

_SCHEMA = ("doc_id long, title string, main_text string, "
           "n_blocks long, n_kept long")


def _strip_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            res = strip_html(wrap_document(doc_id, text))
            out.append({"doc_id": int(doc_id), **res})
        yield pd.DataFrame(
            out, columns=["doc_id", "title", "main_text",
                          "n_blocks", "n_kept"])


@register("html_main_content", oracle=f"""
WITH idx AS (
    SELECT doc_id, text,
           unnest(range(CAST(ceil(length(text) / {CHUNK}.0) AS BIGINT)))
               AS i
    FROM documents
), chunks AS (
    SELECT doc_id, i,
           trim(substr(text, CAST(i * {CHUNK} + 1 AS BIGINT), {CHUNK}),
                ' ' || chr(9) || chr(10) || chr(13)) AS chunk
    FROM idx
)
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       coalesce(string_agg(
           CASE WHEN length(chunk) >= {MIN_BLOCK_CHARS} THEN chunk END,
           chr(10) ORDER BY i), '') AS main_text,
       {N_BOILERPLATE_BLOCKS}
           + count(*) FILTER (chunk <> '') AS n_blocks,
       count(*) FILTER (length(chunk) >= {MIN_BLOCK_CHARS}) AS n_kept
FROM chunks
GROUP BY doc_id
ORDER BY doc_id
""")
def html_main_content(spark, sf_dir):
    # scale-adaptive scan (guide §2.2): the DOM-parse kernel below is
    # pure per-row CPU — a one-row-group input must not run it on one
    # core (measured 36 s single-task at sf1.0 on local[32])
    docs = read_scaled(spark, f"{sf_dir}/documents.parquet")
    return (docs.select("doc_id", "text")
            .mapInPandas(_strip_kernel, _SCHEMA)
            .orderBy("doc_id"))
