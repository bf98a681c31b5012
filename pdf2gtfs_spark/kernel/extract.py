"""Per-turn extraction kernel: char boxes -> typed table grids -> rows.

Pure pandas/numpy, no Spark. Reproduces the reference's (legacy)
extraction dataflow, which is already column-oriented and therefore the
natural vectorization blueprint:

- line clustering        reference: src/pdf2gtfs/reader.py:369-383
- field (word) split     reference: src/pdf2gtfs/reader.py:349-366
- table split            reference: datastructures/pdftable/pdftable.py:237-268
- header/stop splits     reference: pdftable.py:271-312
- column clustering      reference: pdftable.py:65-95
- field/row/col typing   reference: pdftable/field.py:32-105,
                         pdftable/container.py:217-302
- split stop-name repair reference: pdftable.py:97-115, field.py:107-125
- CSV serialization      reference: pdftable.py:185-234
- timetable normalize    reference: datastructures/timetable/table.py:56-127

All O(n) scans over chars/fields are vectorized (prefix cummax / gap
flags / fancy indexing); the only Python loops iterate over *lines,
tables or columns* (tens per turn), never over chars or cells.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Optional

import numpy as np
import pandas as pd

from pdf2gtfs_spark.config import DEFAULT_CONFIG, ExtractConfig
from pdf2gtfs_spark.kernel.payload import (
    MalformedPayload, PageBox, decode_payload,
)
from pdf2gtfs_spark.kernel.timefmt import match_times

# Field type ladder; order = detection precedence in the reference
# (pdftable/field.py:32-55). STOP is assigned later (needs col+row type).
F_HEADER = "HEADER"
F_REPEAT = "REPEAT"
F_DATA = "DATA"
F_STOP_ANNOT = "STOP_ANNOT"
F_ROW_ANNOT = "ROW_ANNOT"
F_ROUTE_INFO = "ROUTE_INFO"
F_OTHER = "OTHER"

R_HEADER = "HEADER"
R_DATA = "DATA"
R_OTHER = "OTHER"
R_ANNOTATION = "ANNOTATION"
R_ROUTE_INFO = "ROUTE_INFO"

C_STOP = "STOP"
C_STOP_ANNOTATION = "STOP_ANNOTATION"
C_DATA = "DATA"
C_REPEAT = "REPEAT"
C_OTHER = "OTHER"


@dataclass
class TableResult:
    """One extracted table of a turn."""
    # grid cells: row_idx, col_idx, text, row/col types, bbox
    cells: pd.DataFrame
    row_types: list[str]
    col_types: list[str]
    csv_text: str
    entries: pd.DataFrame
    stops: pd.DataFrame


@dataclass
class TurnResult:
    tables: list[TableResult] = dc_field(default_factory=list)
    n_chars: int = 0
    n_fields: int = 0
    malformed: bool = False


def _contains_regex(idents) -> Optional[str]:
    """Regex matching the reference's padded-substring ident check
    (pdftable/field.py:81-87): ' ident ' in ' text '."""
    if not idents:
        return None
    parts = [re.escape(f" {i.lower().strip()} ") for i in idents]
    return "|".join(parts)


class _Matchers:
    """Precompiled vectorized field-content predicates for a config."""

    def __init__(self, cfg: ExtractConfig) -> None:
        self.cfg = cfg
        self.header_re = _contains_regex(tuple(cfg.header_values.keys()))
        self.neg_header_re = _contains_regex(cfg.negative_header_values)
        repeat_flat = tuple(w for pair in cfg.repeat_identifier for w in pair)
        self.repeat_re = _contains_regex(repeat_flat)
        self.stop_annot_re = _contains_regex(
            tuple(cfg.arrival_identifier) + tuple(cfg.departure_identifier))
        self.row_annot_re = _contains_regex(cfg.annot_identifier)
        self.route_re = _contains_regex(cfg.route_identifier)
        # repeat-interval extraction regex per identifier pair
        # (pdftable/container.py:304-313)
        self.interval_res = [
            re.compile(
                rf".*{re.escape(start)}\s*"
                r"(\d{1,3}[-,]\ *\d{1,3}|\d{1,3})"
                rf"\s*{re.escape(end)}.*",
                flags=re.I | re.U)
            for start, end in cfg.repeat_identifier
        ]

    def field_types(self, texts: pd.Series) -> pd.Series:
        """Vectorized field-type ladder (pdftable/field.py:32-55)."""
        padded = " " + texts.str.lower().str.strip() + " "

        def has(rx: Optional[str]) -> pd.Series:
            if rx is None:
                return pd.Series(False, index=texts.index)
            return padded.str.contains(rx, regex=True)

        is_time, _ = match_times(texts, self.cfg.time_format)
        is_header = has(self.header_re) & ~has(self.neg_header_re)
        conds = [
            (is_header, F_HEADER),
            (has(self.repeat_re), F_REPEAT),
            (is_time, F_DATA),
            (has(self.stop_annot_re), F_STOP_ANNOT),
            (has(self.row_annot_re), F_ROW_ANNOT),
            (has(self.route_re), F_ROUTE_INFO),
        ]
        out = pd.Series(F_OTHER, index=texts.index)
        assigned = pd.Series(False, index=texts.index)
        for cond, name in conds:
            hit = cond & ~assigned
            out[hit] = name
            assigned |= cond
        return out

    def repeat_intervals(self, joined_text: str) -> list[str]:
        """All repeat intervals in a column's newline-joined text
        (pdftable/container.py:315-323)."""
        out: list[str] = []
        for rx in self.interval_res:
            out += rx.findall(joined_text)
        return out


_MATCHER_CACHE: dict[int, _Matchers] = {}


def _matchers(cfg: ExtractConfig) -> _Matchers:
    key = id(cfg)
    if key not in _MATCHER_CACHE:
        _MATCHER_CACHE[key] = _Matchers(cfg)
    return _MATCHER_CACHE[key]


# ---------------------------------------------------------------------------
# chars -> lines -> fields
# ---------------------------------------------------------------------------

def cleanup_chars(chars: pd.DataFrame, page: PageBox) -> pd.DataFrame:
    """Round coords + drop off-page boxes (reference: reader.py:115-125)."""
    if chars.empty:
        return chars
    df = chars.round({"x0": 2, "x1": 2, "y0": 2, "y1": 2})
    keep = ((df["x0"] < df["x1"]) & (df["y0"] < df["y1"])
            & (df["x0"] >= page.x0) & (df["x1"] <= page.x1)
            & (df["y0"] >= page.y0) & (df["y1"] <= page.y1))
    return df[keep]


def _anchor_cluster(sorted_vals: np.ndarray, threshold: float) -> np.ndarray:
    """Cluster ascending values: new cluster when val - anchor > threshold,
    where anchor is the first value of the current cluster
    (reference: reader.py:369-383). Input must be sorted ascending and
    unique; loops over clusters (lines), not members (chars)."""
    ids = np.zeros(len(sorted_vals), dtype=np.int64)
    if len(sorted_vals) == 0:
        return ids
    anchor = sorted_vals[0]
    cur = 0
    for i in range(1, len(sorted_vals)):
        if sorted_vals[i] - anchor > threshold:
            cur += 1
            anchor = sorted_vals[i]
        ids[i] = cur
    return ids


def chars_to_fields(chars: pd.DataFrame, cfg: ExtractConfig) -> pd.DataFrame:
    """chars -> fields frame (line_id, x0, y0, x1, y1, text).

    Line clustering (reader.py:369-383): chars sorted by (y0, x0); a new
    line starts when y0 is further than round(mean(char height))/2 from
    the line's first y0. Because the scan is y0-sorted, clustering the
    *unique* y0 values is equivalent and loops over lines, not chars.

    Field split (reader.py:349-366, bbox.py:82-91): within a line sorted
    by x0, a new field starts when x0 exceeds the running max x1 of the
    current field by more than max_char_distance. The running max over
    the whole line prefix equals the within-field running max at every
    comparison point (any earlier field's x1 is <= the gap boundary), so
    a vectorized cummax works.
    """
    if chars.empty:
        return pd.DataFrame(
            columns=["line_id", "x0", "y0", "x1", "y1", "text"])
    line_threshold = round(float((chars["y1"] - chars["y0"]).mean())) / 2

    df = chars.sort_values(["y0", "x0"], kind="stable").reset_index(drop=True)
    uniq_y0 = df["y0"].unique()  # ascending (sorted input)
    line_of_y0 = _anchor_cluster(uniq_y0, line_threshold)
    y0_to_line = pd.Series(line_of_y0, index=uniq_y0)
    df["line_id"] = df["y0"].map(y0_to_line).astype(np.int64)

    # sort within line by x0 (stable keeps (y0, x0) order on ties)
    df = df.sort_values(["line_id", "x0"], kind="stable").reset_index(
        drop=True)
    grp = df.groupby("line_id", sort=True)
    runmax_x1 = grp["x1"].cummax()
    prev_runmax = runmax_x1.groupby(df["line_id"]).shift(1)
    is_new_field = (df["x0"] - prev_runmax) > cfg.max_char_distance
    is_new_field |= prev_runmax.isna()
    field_id = is_new_field.cumsum().to_numpy()

    # vectorized per-field reduction via reduceat on field boundaries
    starts = np.flatnonzero(is_new_field.to_numpy())
    texts = df["text"].to_numpy(dtype=object)
    joined = np.array(
        ["".join(texts[s:e]) for s, e in
         zip(starts, np.append(starts[1:], len(texts)))], dtype=object)
    fields = pd.DataFrame({
        "line_id": df["line_id"].to_numpy()[starts],
        "x0": np.minimum.reduceat(df["x0"].to_numpy(), starts),
        "y0": np.minimum.reduceat(df["y0"].to_numpy(), starts),
        "x1": np.maximum.reduceat(df["x1"].to_numpy(), starts),
        "y1": np.maximum.reduceat(df["y1"].to_numpy(), starts),
        "text": joined,
    })
    del field_id
    fields["text"] = fields["text"].str.strip()
    # reference drops fields whose text is empty (reader.py:213)
    fields = fields[fields["text"] != ""].reset_index(drop=True)
    return fields


# ---------------------------------------------------------------------------
# lines -> tables
# ---------------------------------------------------------------------------

def _row_frame(fields: pd.DataFrame) -> pd.DataFrame:
    """Per-line row bboxes, in y order (Row.from_fields + bbox union)."""
    return fields.groupby("line_id", sort=True).agg(
        x0=("x0", "min"), y0=("y0", "min"),
        x1=("x1", "max"), y1=("y1", "max")).reset_index()


def split_rows_into_tables(rows: pd.DataFrame,
                           cfg: ExtractConfig) -> list[np.ndarray]:
    """Segment rows into tables on bbox y-distance, dropping short runs
    (reference: pdftable/pdftable.py:237-268). Returns per-table arrays
    of line_ids."""
    if rows.empty:
        return []
    y0 = rows["y0"].to_numpy()
    y1 = rows["y1"].to_numpy()
    # bbox.y_distance (bbox.py:75-80): min of the 4 corner diffs
    d = np.minimum.reduce([
        np.abs(y0[1:] - y0[:-1]), np.abs(y0[1:] - y1[:-1]),
        np.abs(y1[1:] - y0[:-1]), np.abs(y1[1:] - y1[:-1])])
    breaks = np.concatenate(([0], (d > cfg.max_row_distance).astype(np.int64)))
    seg = np.cumsum(breaks)
    line_ids = rows["line_id"].to_numpy()
    tables = []
    for s in np.unique(seg):
        members = line_ids[seg == s]
        if len(members) >= cfg.min_row_count:
            tables.append(members)
    return tables


# ---------------------------------------------------------------------------
# per-table analysis (computed once per table)
# ---------------------------------------------------------------------------

def _row_types(fields: pd.DataFrame, line_order: list[int]) -> list[str]:
    """Row type ladder (pdftable/container.py:221-230), vectorized via
    per-type line_id membership sets."""
    ft = fields["ftype"].to_numpy()
    lid = fields["line_id"].to_numpy()
    sets = {t: set(lid[ft == t]) for t in
            (F_HEADER, F_ROW_ANNOT, F_ROUTE_INFO, F_DATA)}
    out = []
    for line in line_order:
        if line in sets[F_HEADER]:
            out.append(R_HEADER)
        elif line in sets[F_ROW_ANNOT]:
            out.append(R_ANNOTATION)
        elif line in sets[F_ROUTE_INFO]:
            out.append(R_ROUTE_INFO)
        elif line in sets[F_DATA]:
            out.append(R_DATA)
        else:
            out.append(R_OTHER)
    return out


def _split_multi_header_tables(
        tables: list[list[int]], fields: pd.DataFrame) -> list[list[int]]:
    """Merge headerless tables into the previous one; split tables with
    several header rows at those rows (pdftable/pdftable.py:283-299).
    The first table is always kept as-is (reference behavior)."""
    if not tables:
        return []
    header_lines_all = set(
        fields.loc[fields["ftype"] == F_HEADER, "line_id"])
    out: list[list[int]] = [list(tables[0])]
    for tbl in tables[1:]:
        header_lines = [lid for lid in tbl if lid in header_lines_all]
        if len(header_lines) > 1:
            # split such that each part starts at a header row
            # (pdftable/pdftable.py:165-183)
            groups: list[list[int]] = [[] for _ in header_lines]
            first_is_splitter = tbl[0] == header_lines[0]
            idx = -1 if first_is_splitter else 0
            hset = set(header_lines)
            for lid in tbl:
                if lid in hset:
                    idx = min(idx + 1, len(groups) - 1)
                groups[idx].append(lid)
            out += [g for g in groups if g]
            continue
        if header_lines:
            out.append(list(tbl))
            continue
        out[-1].extend(tbl)
    return out


def _cluster_columns(fields: pd.DataFrame, m: _Matchers) -> pd.DataFrame:
    """Assign col_id by x-overlap clustering over x0-sorted fields
    (pdftable/pdftable.py:65-95): a field joins the current column iff
    its x0 is strictly less than the running max x1; same-(col,row)
    fields merge into one cell (container.py:336-353).

    Returns a cell frame: col_id, line_id, bbox, text, ftype.
    """
    df = fields.sort_values(["x0", "y0"], kind="stable").reset_index(
        drop=True)
    runmax = df["x1"].cummax().shift(1)
    new_col = runmax.isna() | (runmax <= df["x0"])
    df["col_id"] = new_col.cumsum().astype(np.int64) - 1

    # merge fields sharing (col, row): texts joined with " " when there
    # is an x-gap (container.py:339-348); bboxes unioned. Rare — only
    # the affected groups take the slow path, and only their ftypes are
    # recomputed (merge changes the text).
    dup = df.duplicated(subset=["col_id", "line_id"], keep=False)
    if not dup.any():
        return df[["col_id", "line_id", "x0", "y0", "x1", "y1", "text",
                   "ftype"]].sort_values(
            ["col_id", "y0"], kind="stable").reset_index(drop=True)

    def _merge_group(g: pd.DataFrame) -> pd.Series:
        g = g.sort_values("x0", kind="stable")
        text = g.iloc[0]["text"]
        x1 = g.iloc[0]["x1"]
        for _, r in g.iloc[1:].iterrows():
            sep = " " if (r["x0"] - x1) != 0 else ""
            text += sep + r["text"]
            x1 = max(x1, r["x1"])
        return pd.Series({
            "x0": g["x0"].min(), "y0": g["y0"].min(),
            "x1": g["x1"].max(), "y1": g["y1"].max(), "text": text})

    merged = (df[dup].groupby(["col_id", "line_id"], sort=False)
              .apply(_merge_group, include_groups=False).reset_index())
    merged["ftype"] = m.field_types(merged["text"])
    out = pd.concat([df[~dup][merged.columns], merged], ignore_index=True)
    return out.sort_values(["col_id", "y0"],
                           kind="stable").reset_index(drop=True)


def _column_types(cells: pd.DataFrame, col_order: list[int],
                  m: _Matchers) -> dict[int, str]:
    """Left-to-right lazy column typing (pdftable/container.py:273-302),
    including the retroactive previous-OTHER -> STOP upgrade."""
    types: dict[int, str] = {}
    gb = cells.groupby("col_id", sort=True)
    mean_len = cells["text"].str.len().groupby(cells["col_id"]).mean()
    n_fields = gb.size()
    n_empty = (cells["text"] == "").groupby(cells["col_id"]).sum()
    has_annot = (cells["ftype"] == F_STOP_ANNOT).groupby(
        cells["col_id"]).any()
    has_data = (cells["ftype"] == F_DATA).groupby(cells["col_id"]).any()
    joined = gb["text"].agg("\n".join)
    for i, cid in enumerate(col_order):
        is_sparse = (n_fields[cid] / max(1, int(n_empty[cid]))) <= 0.5
        if not is_sparse and mean_len[cid] > 8:
            types[cid] = C_STOP
            continue
        if m.repeat_intervals(joined[cid]):
            types[cid] = C_REPEAT
            continue
        if has_annot[cid]:
            if i > 0 and types.get(col_order[i - 1]) == C_OTHER:
                types[col_order[i - 1]] = C_STOP
            types[cid] = C_STOP_ANNOTATION
            continue
        if has_data[cid]:
            types[cid] = C_DATA
            continue
        types[cid] = C_OTHER
    return types


@dataclass
class _TableAnalysis:
    line_order: list[int]
    rtypes: list[str]
    row_type_of_line: dict[int, str]
    line_to_row: dict[int, int]
    tfields: pd.DataFrame
    cells: pd.DataFrame
    col_order: list[int]
    col_types: dict[int, str]


def _analyze_table(tfields: pd.DataFrame, line_order: list[int],
                   m: _Matchers) -> Optional[_TableAnalysis]:
    rtypes = _row_types(tfields, line_order)
    row_type_of_line = dict(zip(line_order, rtypes))
    body_lines = {lid for lid, t in zip(line_order, rtypes)
                  if t in (R_DATA, R_ANNOTATION, R_ROUTE_INFO)}
    body = tfields[tfields["line_id"].isin(body_lines)]
    if body.empty:
        return None
    cells = _cluster_columns(body, m)
    col_order = sorted(cells["col_id"].unique().tolist())
    col_types = _column_types(cells, col_order, m)
    return _TableAnalysis(
        line_order=list(line_order), rtypes=rtypes,
        row_type_of_line=row_type_of_line,
        line_to_row={lid: i for i, lid in enumerate(line_order)},
        tfields=tfields, cells=cells, col_order=col_order,
        col_types=col_types)


# ---------------------------------------------------------------------------
# split stop-name repair
# ---------------------------------------------------------------------------

def get_stop_base_name(stop_name: str) -> str:
    """Most likely base name of a stop (reference: utils.py:159-173)."""
    merge_chars = {",": ", ", "-": " - ", " ": " "}
    for split_char in [",", "-", " "]:
        split_text = stop_name.split(split_char, 1)
        if len(split_text) <= 1:
            continue
        return split_text[0].strip() + merge_chars[split_char]
    return stop_name.strip()


def text_starts_with_delimiter(text: str) -> bool:
    """reference: utils.py:176-181."""
    return text.startswith("-") or text.startswith(",")


def bbox_is_indented(ref_x0: float, x0: float) -> bool:
    """reference: utils.py:184-188 (min indentation 3pt)."""
    return (x0 - ref_x0) >= 3


def fix_split_stop_names(stop_cells: pd.DataFrame,
                         row_type_of_line: dict[int, str]) -> pd.Series:
    """Repair split stop names in the stop column's cells (y order).

    reference: pdftable/pdftable.py:97-115 + field.py:107-125. Returns
    the fixed text Series (aligned to stop_cells.index). The loop runs
    over the stop column's rows (tens), not data cells.
    """
    texts = stop_cells["text"].tolist()
    x0s = stop_cells["x0"].tolist()
    lines = stop_cells["line_id"].tolist()
    first_idx = None
    for i, lid in enumerate(lines):
        if row_type_of_line.get(lid) == R_DATA:
            first_idx = i
            break
    if first_idx is None:
        return stop_cells["text"]
    ref_i = first_idx
    out = list(texts)
    for i in range(first_idx, len(texts)):
        starts_delim = text_starts_with_delimiter(out[i])
        indented = bbox_is_indented(x0s[ref_i], x0s[i])
        if not starts_delim and not indented:
            ref_i = i
            continue
        if out[ref_i].endswith(out[i]):
            out[i] = out[ref_i]
            continue
        text = out[i][1:].strip() if starts_delim else out[i]
        out[i] = get_stop_base_name(out[ref_i]) + text
    return pd.Series(out, index=stop_cells.index)


# ---------------------------------------------------------------------------
# CSV serialization (the golden-fixture equality surface)
# ---------------------------------------------------------------------------

def table_to_csv(a: _TableAnalysis, placeable: pd.DataFrame) -> str:
    """Serialize a table grid exactly like the reference CSV writer
    (pdftable/pdftable.py:185-234): cells per (row, col), header-typed
    fields placed at the first column whose x0 exceeds theirs, rows
    that are entirely empty dropped, trailing newline kept."""
    n_rows, n_cols = len(a.line_order), len(a.col_order)
    col_pos = {cid: i for i, cid in enumerate(a.col_order)}
    grid = np.full((n_rows, n_cols), "", dtype=object)

    t = a.cells["text"].str.replace('"', "", regex=False).str.strip()
    t = t.where(~t.str.contains(",", regex=False), '"' + t + '"')
    rows_i = a.cells["line_id"].map(a.line_to_row).to_numpy()
    cols_i = a.cells["col_id"].map(col_pos).to_numpy()
    grid[rows_i, cols_i] = t.to_numpy(dtype=object)

    if len(placeable):
        # first col whose x0 > field.x0; else last (pdftable.py:197-205)
        col_x0s = a.cells.groupby("col_id")["x0"].min()
        xs = np.array([col_x0s[c] for c in a.col_order])
        idxs = np.minimum(
            np.searchsorted(xs, placeable["x0"].to_numpy(), side="right"),
            n_cols - 1)
        hrows = placeable["line_id"].map(a.line_to_row).to_numpy()
        for r, c, txt in zip(hrows, idxs, placeable["text"]):
            grid[r, c] = txt
    lines = [",".join(row) for row in grid if any(row)]
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# timetable normalization
# ---------------------------------------------------------------------------

ENTRY_COLUMNS = [
    "table_id", "entry_id", "kind", "header_text", "route_name",
    "annotations", "days", "repeat_intervals",
    "stop_pos", "stop_row_idx", "stop_name", "stop_annot",
    "is_connection", "value",
]
STOP_COLUMNS = ["table_id", "stop_pos", "row_idx", "stop_name",
                "stop_annot", "is_connection"]


def interval_str_to_int_list(value_str: str) -> list[int]:
    """reference: timetable/entries.py:86-120."""
    for char in (",", "-"):
        try:
            vals = list(map(int, value_str.split(char)))
        except ValueError:
            continue
        if len(vals) > 1:
            if char == "-" and len(vals) == 2:
                return list(range(vals[0], vals[1] + 1))
            return vals
    try:
        return [int(value_str)]
    except ValueError:
        return []


def repeat_intervals_to_list(intervals: list[str]) -> Optional[list[int]]:
    """Dedup + parse; multiple distinct intervals -> skip column
    (reference: timetable/entries.py:76-84)."""
    uniq = list(set(intervals))
    if len(uniq) != 1:
        return None
    return interval_str_to_int_list(uniq[0])


def detect_connections(stop_names: list[str],
                       cfg: ExtractConfig) -> list[bool]:
    """Mark interior stops of name-cycles as connections
    (reference: timetable/table.py:26-54)."""
    n = len(stop_names)
    is_conn = [False] * n
    if cfg.min_connection_count <= 0:
        return is_conn
    cycles: dict[str, list[int]] = {}
    for i, name in enumerate(stop_names):
        cycles.setdefault(name, []).append(i)
    for cycle in cycles.values():
        if len(cycle) == 1:
            continue
        start_idx, end_idx = cycle[0] + 1, cycle[-1]
        indices = range(start_idx, end_idx)
        round_trip = cycle[0] == 0 and end_idx == n - 1
        if round_trip or len(indices) < cfg.min_connection_count:
            continue
        for j in indices:
            is_conn[j] = True
    return is_conn


def _header_texts_for_columns(header_fields: pd.DataFrame,
                              line_to_row: dict[int, int],
                              col_x1s: np.ndarray) -> list[str]:
    """Vectorized get_header_from_column (pdftable/pdftable.py:121-129).

    Only the first header row matters (the reference's inner loop
    always returns at the row's last field); within it, the answer is
    the first field whose successor starts at/after the column's right
    edge — a searchsorted over the successors' x0.
    """
    if header_fields.empty:
        return [""] * len(col_x1s)
    first_lid = min(header_fields["line_id"].unique(),
                    key=lambda lid: line_to_row[lid])
    row = header_fields[header_fields["line_id"] == first_lid] \
        .sort_values("x0", kind="stable")
    hx = row["x0"].to_numpy()
    texts = row["text"].to_numpy(dtype=object)
    # smallest i with hx[i+1] >= col_x1, else last field
    idx = np.minimum(np.searchsorted(hx[1:], col_x1s, side="left"),
                     len(texts) - 1)
    return [str(texts[i]) for i in idx]


def _normalize_timetable(table_id: int, a: _TableAnalysis,
                         header_fields: pd.DataFrame,
                         cfg: ExtractConfig, m: _Matchers,
                         fixed_stop_text: dict[int, str]
                         ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """PDFTable -> normalized timetable rows
    (reference: timetable/table.py:56-127). Vectorized: loops run per
    column (metadata), cell-level work is frame ops."""
    cells = a.cells
    rt = cells["line_id"].map(a.row_type_of_line)
    row_idx = cells["line_id"].map(a.line_to_row)
    ctype = cells["col_id"].map(a.col_types)

    # stops: DATA-row cells of STOP columns, in column-then-y order
    stop_mask = (ctype == C_STOP) & (rt == R_DATA)
    sc = cells[stop_mask].sort_values(["col_id", "y0"], kind="stable")
    first_stop_col = sc["col_id"].iloc[0] if len(sc) else None
    names = sc["text"].str.strip()
    if fixed_stop_text and first_stop_col is not None:
        in_first = sc["col_id"] == first_stop_col
        fixed = sc["line_id"].map(fixed_stop_text)
        names = fixed.str.strip().where(in_first & fixed.notna(), names)
    stops_df = pd.DataFrame({
        "table_id": table_id,
        "stop_pos": np.arange(len(sc)),
        "row_idx": sc["line_id"].map(a.line_to_row).to_numpy(),
        "stop_name": names.to_numpy(dtype=object),
        "stop_annot": "",
        "is_connection": False,
    })

    # stop annotations (STOP_ANNOTATION cols; route/annot rows skipped)
    annot_mask = ((ctype == C_STOP_ANNOTATION)
                  & ~rt.isin([R_ROUTE_INFO, R_ANNOTATION]))
    if annot_mask.any():
        ann = cells[annot_mask].sort_values(["col_id", "y0"], kind="stable")
        ann_rows = ann["line_id"].map(a.line_to_row)
        ann_map = dict(zip(ann_rows, ann["text"]))  # later cols overwrite
        stops_df["stop_annot"] = stops_df["row_idx"].map(ann_map).fillna("")

    stops_df["is_connection"] = detect_connections(
        stops_df["stop_name"].tolist(), cfg)
    stop_pos_of_row = dict(zip(stops_df["row_idx"], stops_df["stop_pos"]))

    # entries: one per DATA/REPEAT column with at least one DATA value
    entry_cols = [cid for cid in a.col_order
                  if a.col_types[cid] in (C_DATA, C_REPEAT)]
    if not entry_cols:
        return (pd.DataFrame(columns=ENTRY_COLUMNS), stops_df)

    col_x1s = cells.groupby("col_id")["x1"].max()
    header_texts = _header_texts_for_columns(
        header_fields, a.line_to_row,
        np.array([col_x1s[c] for c in entry_cols]))

    # per-column metadata (loops over columns, not cells)
    ann_join = (cells[rt == R_ANNOTATION]
                .groupby("col_id")["text"].agg(" ".join))
    route_first = (cells[rt == R_ROUTE_INFO]
                   .sort_values("y0", kind="stable")
                   .groupby("col_id")["text"].first())
    joined = cells.groupby("col_id")["text"].agg("\n".join)

    values = cells[(rt == R_DATA) & ctype.isin([C_DATA, C_REPEAT])]
    counts = values.groupby("col_id").size()

    meta_rows = []
    entry_id = -1
    for cid, header_text in zip(entry_cols, header_texts):
        if int(counts.get(cid, 0)) == 0:
            continue
        entry_id += 1
        kind = ("repeat" if a.col_types[cid] == C_REPEAT else "time")
        repeat = None
        if kind == "repeat":
            repeat = repeat_intervals_to_list(
                m.repeat_intervals(joined[cid]))
        annots = sorted({w for w in str(ann_join.get(cid, "")).split(" ")
                         if w})
        days = cfg.header_values.get(header_text.lower().strip(), "")
        meta_rows.append({
            "col_id": cid, "entry_id": entry_id, "kind": kind,
            "header_text": header_text,
            "route_name": str(route_first.get(cid, "")),
            "annotations": annots,
            "days": [d for d in days.split(",") if d] if days else [],
            "repeat_intervals": repeat,
        })
    if not meta_rows:
        return (pd.DataFrame(columns=ENTRY_COLUMNS), stops_df)
    meta = pd.DataFrame(meta_rows)

    vals = values.sort_values(["col_id", "y0"], kind="stable")[
        ["col_id", "line_id", "text"]].copy()
    vals["stop_row_idx"] = vals["line_id"].map(a.line_to_row)
    vals["stop_pos"] = vals["stop_row_idx"].map(stop_pos_of_row)
    vals = vals.merge(meta, on="col_id", how="inner")
    # is_connection rides along so the GTFS tail can skip connection
    # stops without re-joining stops (gtfs_output/stop_times.py:205-207)
    vals = vals.merge(
        stops_df[["stop_pos", "stop_name", "stop_annot", "is_connection"]],
        on="stop_pos", how="left")
    vals["is_connection"] = np.where(
        vals["is_connection"].isna(), False,
        vals["is_connection"]).astype(bool)
    vals["table_id"] = table_id
    vals["value"] = vals["text"]
    vals["stop_pos"] = vals["stop_pos"].astype("object").where(
        vals["stop_pos"].notna(), None)
    entries = vals[ENTRY_COLUMNS].reset_index(drop=True)
    return entries, stops_df


# ---------------------------------------------------------------------------
# the per-table pipeline
# ---------------------------------------------------------------------------

def _process_table(table_id: int, a: _TableAnalysis,
                   cfg: ExtractConfig, m: _Matchers
                   ) -> Optional[TableResult]:
    # Split stop-name repair (pdftable.py:97-115). The golden CSV
    # fixtures carry the *raw* texts (e.g. kvv_s1/01_00.csv row 35
    # "- Hauptbahnhof ..."), so the repair is applied only to the
    # normalized timetable stop names, not to the CSV/grid surface.
    fixed_stop_text: dict[int, str] = {}
    stop_cols = [c for c in a.col_order if a.col_types[c] == C_STOP]
    if stop_cols:
        sub = a.cells[a.cells["col_id"] == stop_cols[0]].sort_values(
            "y0", kind="stable")
        fixed = fix_split_stop_names(sub, a.row_type_of_line)
        fixed_stop_text = dict(zip(sub["line_id"], fixed))

    row_type_series = a.tfields["line_id"].map(a.row_type_of_line)
    # all fields of HEADER rows: used for per-column header text
    # (pdftable/pdftable.py:121-129)
    header_fields = a.tfields[row_type_series == R_HEADER]
    # HEADER-*typed* fields outside any column: placed into the CSV
    # (pdftable/pdftable.py:222-228)
    placeable = a.tfields[(a.tfields["ftype"] == F_HEADER)
                          & row_type_series.isin([R_HEADER, R_OTHER])]
    csv_text = table_to_csv(a, placeable)

    entries, stops = _normalize_timetable(
        table_id, a, header_fields, cfg, m, fixed_stop_text)

    col_pos = {cid: i for i, cid in enumerate(a.col_order)}
    grid = a.cells.copy()
    grid["row_idx"] = grid["line_id"].map(a.line_to_row)
    grid["col_idx"] = grid["col_id"].map(col_pos)
    grid["row_type"] = grid["line_id"].map(a.row_type_of_line)
    grid["col_type"] = grid["col_id"].map(a.col_types)
    grid = grid[["row_idx", "col_idx", "text", "row_type", "col_type",
                 "x0", "y0", "x1", "y1"]].reset_index(drop=True)
    return TableResult(
        cells=grid,
        row_types=a.rtypes,
        col_types=[a.col_types[c] for c in a.col_order],
        csv_text=csv_text,
        entries=entries,
        stops=stops,
    )


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def extract_turn(payload: str,
                 cfg: ExtractConfig = DEFAULT_CONFIG) -> TurnResult:
    """Run the full extraction on one turn payload.

    Dispatches on ``cfg.extraction_path``: "legacy" runs the window
    pipeline below (the golden-fixture path); "new" runs the
    reference's default engine (probabilistic cell typing + table
    expansion, kernel/newpath.py).
    """
    try:
        page, chars = decode_payload(payload)
    except MalformedPayload:
        return TurnResult(malformed=True)
    chars = cleanup_chars(chars, page)
    result = TurnResult(n_chars=len(chars))
    if chars.empty:
        return result
    fields = chars_to_fields(chars, cfg)
    result.n_fields = len(fields)
    if fields.empty:
        return result
    if cfg.extraction_path == "new":
        from pdf2gtfs_spark.kernel.newpath import tables_from_fields

        for table_id, tt in enumerate(tables_from_fields(fields, cfg)):
            result.tables.append(tt.to_result(table_id, cfg))
        return result
    m = _matchers(cfg)
    fields = fields.copy()
    fields["ftype"] = m.field_types(fields["text"])

    rows = _row_frame(fields)
    raw_tables = [list(t) for t in split_rows_into_tables(rows, cfg)]
    tables = _split_multi_header_tables(raw_tables, fields)

    table_id = 0
    for line_order in tables:
        tfields = fields[fields["line_id"].isin(set(line_order))]
        if tfields.empty:
            continue
        analysis = _analyze_table(tfields, line_order, m)
        if analysis is None:
            continue
        for sub in _split_multi_stop_columns(analysis, m):
            res = _process_table(table_id, sub, cfg, m)
            if res is None or res.cells.empty:
                continue
            result.tables.append(res)
            table_id += 1
    return result


def _split_multi_stop_columns(a: _TableAnalysis,
                              m: _Matchers) -> list[_TableAnalysis]:
    """Split a table with several STOP columns into one table per stop
    column (pdftable/pdftable.py:151-163, 302-312). Fields are bucketed
    by the x0 of the 2nd..nth stop column; the single-stop fast path
    reuses the existing analysis (no recomputation)."""
    stop_cols = [c for c in a.col_order if a.col_types[c] == C_STOP]
    if len(stop_cols) <= 1:
        return [a]
    col_x0 = a.cells.groupby("col_id")["x0"].min()
    boundaries = sorted(col_x0[c] for c in stop_cols)[1:]
    bucket = np.searchsorted(np.asarray(boundaries),
                             a.tfields["x0"].to_numpy(), side="right")
    out = []
    for b in range(len(stop_cols)):
        part = a.tfields[bucket == b]
        if part.empty:
            continue
        part_lines = set(part["line_id"].tolist())
        lines = [lid for lid in a.line_order if lid in part_lines]
        sub = _analyze_table(part, lines, m)
        if sub is not None:
            out.append(sub)
    return out
