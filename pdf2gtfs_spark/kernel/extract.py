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
flags); the only Python loops iterate over *lines, tables or columns*
(tens per turn), never over chars.
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
    # grid cells: row_idx, col_idx, text, x0, y0, x1, y1
    cells: pd.DataFrame
    row_types: list[str]
    col_types: list[str]
    csv_text: str
    # normalized timetable rows (see entries_frame)
    entries: pd.DataFrame
    stops: pd.DataFrame


@dataclass
class TurnResult:
    tables: list[TableResult] = dc_field(default_factory=list)
    n_chars: int = 0
    n_fields: int = 0
    malformed: bool = False


def _contains_regex(idents: tuple[str, ...] | list[str]) -> Optional[str]:
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
    unique; output is a cluster id per value."""
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
    df["field_id"] = is_new_field.cumsum()

    fields = df.groupby("field_id", sort=True).agg(
        line_id=("line_id", "first"),
        x0=("x0", "min"), y0=("y0", "min"),
        x1=("x1", "max"), y1=("y1", "max"),
        text=("text", lambda s: "".join(s)),
    ).reset_index(drop=True)
    fields["text"] = fields["text"].str.strip()
    # reference drops fields whose text is empty (reader.py:213)
    fields = fields[fields["text"] != ""].reset_index(drop=True)
    return fields


# ---------------------------------------------------------------------------
# lines -> tables
# ---------------------------------------------------------------------------

def _row_frame(fields: pd.DataFrame) -> pd.DataFrame:
    """Per-line row bboxes, in y order (Row.from_fields + bbox union)."""
    rows = fields.groupby("line_id", sort=True).agg(
        x0=("x0", "min"), y0=("y0", "min"),
        x1=("x1", "max"), y1=("y1", "max")).reset_index()
    return rows


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
# per-table: row types, header/stop splits, columns
# ---------------------------------------------------------------------------

def _row_types(fields: pd.DataFrame, line_order: list[int]) -> list[str]:
    """Row type ladder (pdftable/container.py:221-230)."""
    by_line = fields.groupby("line_id")["ftype"]
    has = by_line.agg(lambda s: set(s)).to_dict()
    out = []
    for lid in line_order:
        types = has.get(lid, set())
        if F_HEADER in types:
            out.append(R_HEADER)
        elif F_ROW_ANNOT in types:
            out.append(R_ANNOTATION)
        elif F_ROUTE_INFO in types:
            out.append(R_ROUTE_INFO)
        elif F_DATA in types:
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
    out: list[list[int]] = [list(tables[0])]
    for tbl in tables[1:]:
        rtypes = _row_types(fields[fields["line_id"].isin(tbl)], list(tbl))
        header_lines = [lid for lid, t in zip(tbl, rtypes) if t == R_HEADER]
        if len(header_lines) > 1:
            # split such that each part starts at a header row
            # (pdftable/pdftable.py:165-183)
            groups: list[list[int]] = [[] for _ in header_lines]
            first_is_splitter = tbl[0] == header_lines[0]
            idx = -1 if first_is_splitter else 0
            for lid in tbl:
                if lid in header_lines:
                    idx = min(idx + 1, len(groups) - 1)
                groups[idx].append(lid)
            out += [g for g in groups if g]
            continue
        if header_lines:
            out.append(list(tbl))
            continue
        out[-1].extend(tbl)
    return out


def _cluster_columns(fields: pd.DataFrame) -> pd.DataFrame:
    """Assign col_id by x-overlap clustering over x0-sorted fields
    (pdftable/pdftable.py:65-95): a field joins the current column iff
    its x0 is strictly less than the running max x1; same-(col,row)
    fields merge into one cell (container.py:336-353).

    Returns a cell frame: col_id, line_id, x0, y0, x1, y1, text.
    """
    df = fields.sort_values(["x0", "y0"], kind="stable").reset_index(
        drop=True)
    runmax = df["x1"].cummax().shift(1)
    new_col = runmax.isna() | (runmax <= df["x0"])
    df["col_id"] = new_col.cumsum().astype(np.int64) - 1

    # merge fields sharing (col, row): texts joined with " " when there
    # is an x-gap (container.py:339-348); bboxes unioned.
    dup = df.duplicated(subset=["col_id", "line_id"], keep=False)
    if not dup.any():
        cells = df[["col_id", "line_id", "x0", "y0", "x1", "y1", "text"]]
        return cells.sort_values(["col_id", "y0"],
                                 kind="stable").reset_index(drop=True)

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

    merged = (df.groupby(["col_id", "line_id"], sort=False)
              .apply(_merge_group, include_groups=False).reset_index())
    return merged.sort_values(["col_id", "y0"],
                              kind="stable").reset_index(drop=True)


def _column_types(cells: pd.DataFrame, col_order: list[int],
                  m: _Matchers) -> dict[int, str]:
    """Left-to-right lazy column typing (pdftable/container.py:273-302),
    including the retroactive previous-OTHER -> STOP upgrade."""
    types: dict[int, str] = {}
    by_col = {cid: g for cid, g in cells.groupby("col_id", sort=True)}
    for i, cid in enumerate(col_order):
        g = by_col[cid]
        mean_len = g["text"].str.len().mean()
        empty = int((g["text"] == "").sum())
        is_sparse = (len(g) / max(1, empty)) <= 0.5
        if not is_sparse and mean_len > 8:
            types[cid] = C_STOP
            continue
        if m.repeat_intervals("\n".join(g["text"])):
            types[cid] = C_REPEAT
            continue
        if (g["ftype"] == F_STOP_ANNOT).any():
            if i > 0 and types.get(col_order[i - 1]) == C_OTHER:
                types[col_order[i - 1]] = C_STOP
            types[cid] = C_STOP_ANNOTATION
            continue
        if (g["ftype"] == F_DATA).any():
            types[cid] = C_DATA
            continue
        types[cid] = C_OTHER
    return types


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
    the fixed text Series (aligned to stop_cells.index).
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

def _escape_field_text(text: str) -> str:
    """reference: pdftable/pdftable.py:187-195."""
    text = text.replace('"', "").strip()
    if "," in text:
        return f'"{text}"'
    return text


def table_to_csv(n_rows: int, col_order: list[int],
                 col_x0: dict[int, float],
                 cells: pd.DataFrame, line_to_row: dict[int, int],
                 header_fields: pd.DataFrame) -> str:
    """Serialize a table grid exactly like the reference CSV writer
    (pdftable/pdftable.py:185-234): cells per (row, col), header-row
    fields placed at the first column whose x0 exceeds theirs, rows that
    are entirely empty dropped, trailing newline kept."""
    n_cols = len(col_order)
    grid = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    col_pos = {cid: i for i, cid in enumerate(col_order)}
    for _, r in cells.iterrows():
        grid[line_to_row[r["line_id"]]][col_pos[r["col_id"]]] = (
            _escape_field_text(r["text"]))
    x0s = [col_x0[cid] for cid in col_order]
    for _, f in header_fields.iterrows():
        idx = n_cols - 1
        for i, x in enumerate(x0s):
            if x > f["x0"]:
                idx = i
                break
        grid[line_to_row[f["line_id"]]][idx] = f["text"]
    lines = [",".join(row) for row in grid if any(row)]
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# timetable normalization
# ---------------------------------------------------------------------------

ENTRY_COLUMNS = [
    "table_id", "entry_id", "kind", "header_text", "route_name",
    "annotations", "days", "repeat_intervals",
    "stop_pos", "stop_row_idx", "stop_name", "stop_annot", "value",
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
        if char == "," and len(vals) > 1:
            return vals
        if char == "-" and len(vals) > 1:
            if len(vals) == 2:
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


# ---------------------------------------------------------------------------
# the per-table pipeline
# ---------------------------------------------------------------------------

def _process_table(table_id: int, tfields: pd.DataFrame, line_order: list[int],
                   cfg: ExtractConfig, m: _Matchers) -> Optional[TableResult]:
    rtypes = _row_types(tfields, line_order)
    row_type_of_line = dict(zip(line_order, rtypes))
    line_to_row = {lid: i for i, lid in enumerate(line_order)}

    body_lines = [lid for lid, t in zip(line_order, rtypes)
                  if t in (R_DATA, R_ANNOTATION, R_ROUTE_INFO)]
    body = tfields[tfields["line_id"].isin(body_lines)]
    if body.empty:
        return None
    cells = _cluster_columns(body)
    # re-derive ftype for merged cells (merge may change the text)
    cells["ftype"] = m.field_types(cells["text"])

    col_order = sorted(cells["col_id"].unique().tolist())
    col_types = _column_types(cells, col_order, m)

    # Split stop-name repair (pdftable.py:97-115). The golden CSV
    # fixtures carry the *raw* texts (e.g. kvv_s1/01_00.csv row 35
    # "- Hauptbahnhof ..."), so the repair is applied only to the
    # normalized timetable stop names, not to the CSV/grid surface.
    fixed_stop_text: dict[int, str] = {}
    stop_cols = [c for c in col_order if col_types[c] == C_STOP]
    if stop_cols:
        sc = stop_cols[0]
        sub = cells[cells["col_id"] == sc].sort_values("y0", kind="stable")
        fixed = fix_split_stop_names(sub, row_type_of_line)
        fixed_stop_text = dict(zip(sub["line_id"], fixed))

    col_x0 = cells.groupby("col_id")["x0"].min().to_dict()
    row_type_series = tfields["line_id"].map(row_type_of_line)
    # all fields of HEADER rows: used for per-column header text
    # (pdftable/pdftable.py:121-129)
    header_fields = tfields[row_type_series == R_HEADER]
    # HEADER-*typed* fields outside any column: placed into the CSV
    # (pdftable/pdftable.py:222-228)
    placeable = tfields[(tfields["ftype"] == F_HEADER)
                        & row_type_series.isin([R_HEADER, R_OTHER])]
    csv_text = table_to_csv(len(line_order), col_order, col_x0, cells,
                            line_to_row, placeable)

    entries, stops = _normalize_timetable(
        table_id, cells, col_order, col_types, row_type_of_line,
        line_to_row, header_fields, cfg, m, fixed_stop_text)

    grid = cells.copy()
    grid["row_idx"] = grid["line_id"].map(line_to_row)
    grid["col_idx"] = grid["col_id"].map(
        {cid: i for i, cid in enumerate(col_order)})
    grid["row_type"] = grid["line_id"].map(row_type_of_line)
    grid["col_type"] = grid["col_id"].map(col_types)
    grid = grid[["row_idx", "col_idx", "text", "row_type", "col_type",
                 "x0", "y0", "x1", "y1"]].reset_index(drop=True)
    return TableResult(
        cells=grid,
        row_types=rtypes,
        col_types=[col_types[c] for c in col_order],
        csv_text=csv_text,
        entries=entries,
        stops=stops,
    )


def _header_text_for_column(header_fields: pd.DataFrame,
                            header_line_order: list[int],
                            col_x1: float) -> str:
    """reference: pdftable/pdftable.py:121-129 (get_header_from_column)."""
    for lid in header_line_order:
        row = header_fields[header_fields["line_id"] == lid].sort_values(
            "x0", kind="stable")
        fields = list(row.itertuples())
        for i, f in enumerate(fields, 1):
            nxt = fields[i] if i < len(fields) else None
            if nxt is None or nxt.x0 >= col_x1:
                return f.text
    return ""


def _normalize_timetable(table_id: int, cells: pd.DataFrame,
                         col_order: list[int], col_types: dict[int, str],
                         row_type_of_line: dict[int, str],
                         line_to_row: dict[int, int],
                         header_fields: pd.DataFrame,
                         cfg: ExtractConfig, m: _Matchers,
                         fixed_stop_text: dict[int, str] | None = None
                         ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """PDFTable -> normalized timetable rows
    (reference: timetable/table.py:56-127)."""
    header_line_order = sorted(
        header_fields["line_id"].unique().tolist(),
        key=lambda lid: line_to_row[lid])

    stops: list[dict] = []            # in insertion order
    stop_by_row: dict[int, int] = {}  # row_idx -> stop_pos
    entry_rows: list[dict] = []
    entry_id = -1

    by_col = {cid: g.sort_values("y0", kind="stable")
              for cid, g in cells.groupby("col_id", sort=True)}
    col_x1 = cells.groupby("col_id")["x1"].max().to_dict()

    # first pass: stops from the STOP columns + annotations
    for cid in col_order:
        ctype = col_types[cid]
        if ctype == C_STOP:
            for r in by_col[cid].itertuples():
                rt = row_type_of_line.get(r.line_id)
                if rt == R_DATA:
                    row_idx = line_to_row[r.line_id]
                    stop_by_row[row_idx] = len(stops)
                    name = r.text
                    if fixed_stop_text and r.line_id in fixed_stop_text:
                        name = fixed_stop_text[r.line_id]
                    stops.append({
                        "table_id": table_id, "stop_pos": len(stops),
                        "row_idx": row_idx, "stop_name": name.strip(),
                        "stop_annot": "", "is_connection": False})
        elif ctype == C_STOP_ANNOTATION:
            for r in by_col[cid].itertuples():
                rt = row_type_of_line.get(r.line_id)
                if rt in (R_ROUTE_INFO, R_ANNOTATION):
                    continue
                pos = stop_by_row.get(line_to_row[r.line_id])
                if pos is not None:
                    stops[pos]["stop_annot"] = r.text

    is_conn = detect_connections([s["stop_name"] for s in stops], cfg)
    for s, c in zip(stops, is_conn):
        s["is_connection"] = c

    # second pass: entries (one per non-OTHER, non-STOP/annot column)
    for cid in col_order:
        ctype = col_types[cid]
        if ctype in (C_OTHER, C_STOP, C_STOP_ANNOTATION):
            continue
        g = by_col[cid]
        header_text = _header_text_for_column(
            header_fields, header_line_order, col_x1[cid])
        days = cfg.header_values.get(header_text.lower().strip(), "")
        annots: set[str] = set()
        route_name = ""
        for r in g.itertuples():
            rt = row_type_of_line.get(r.line_id)
            if rt == R_ANNOTATION:
                annots |= {a for a in r.text.strip().split(" ") if a}
            elif rt == R_ROUTE_INFO and not route_name:
                route_name = r.text
        repeat: Optional[list[int]] = None
        kind = "time"
        if ctype == C_REPEAT:
            kind = "repeat"
            repeat = repeat_intervals_to_list(
                m.repeat_intervals("\n".join(g["text"])))
        entry_id += 1
        values = []
        for r in g.itertuples():
            rt = row_type_of_line.get(r.line_id)
            if rt != R_DATA:
                continue
            row_idx = line_to_row[r.line_id]
            pos = stop_by_row.get(row_idx)
            values.append((pos, row_idx, r.text))
        if not values:
            entry_id -= 1
            continue
        days_list = [d for d in days.split(",") if d] if days else []
        for pos, row_idx, value in values:
            stop = stops[pos] if pos is not None else None
            entry_rows.append({
                "table_id": table_id, "entry_id": entry_id, "kind": kind,
                "header_text": header_text, "route_name": route_name,
                "annotations": sorted(annots), "days": days_list,
                "repeat_intervals": repeat,
                "stop_pos": pos,
                "stop_row_idx": row_idx,
                "stop_name": stop["stop_name"] if stop else None,
                "stop_annot": stop["stop_annot"] if stop else None,
                "value": value})

    entries = pd.DataFrame(entry_rows, columns=ENTRY_COLUMNS)
    stops_df = pd.DataFrame(stops, columns=STOP_COLUMNS)
    return entries, stops_df


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def extract_turn(payload: str,
                 cfg: ExtractConfig = DEFAULT_CONFIG) -> TurnResult:
    """Run the full extraction on one turn payload."""
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
    m = _matchers(cfg)
    fields = fields.copy()
    fields["ftype"] = m.field_types(fields["text"])

    rows = _row_frame(fields)
    raw_tables = [list(t) for t in split_rows_into_tables(rows, cfg)]
    tables = _split_multi_header_tables(raw_tables, fields)

    table_id = 0
    for line_order in tables:
        tfields = fields[fields["line_id"].isin(line_order)]
        if tfields.empty:
            continue
        # multi-stop-column split (pdftable/pdftable.py:302-312)
        sub_tables = _split_multi_stop_columns(tfields, line_order, m)
        for sub_fields, sub_lines in sub_tables:
            res = _process_table(table_id, sub_fields, sub_lines, cfg, m)
            if res is None or res.cells.empty:
                continue
            result.tables.append(res)
            table_id += 1
    return result


def _split_multi_stop_columns(
        tfields: pd.DataFrame, line_order: list[int],
        m: _Matchers) -> list[tuple[pd.DataFrame, list[int]]]:
    """Split a table with several STOP columns into one table per stop
    column (pdftable/pdftable.py:151-163, 302-312). Fields are bucketed
    by the x0 of the 2nd..nth stop column."""
    rtypes = _row_types(tfields, line_order)
    row_type_of_line = dict(zip(line_order, rtypes))
    body_lines = [lid for lid, t in zip(line_order, rtypes)
                  if t in (R_DATA, R_ANNOTATION, R_ROUTE_INFO)]
    body = tfields[tfields["line_id"].isin(body_lines)]
    if body.empty:
        return [(tfields, line_order)]
    cells = _cluster_columns(body)
    cells["ftype"] = m.field_types(cells["text"])
    col_order = sorted(cells["col_id"].unique().tolist())
    col_types = _column_types(cells, col_order, m)
    stop_cols = [c for c in col_order if col_types[c] == C_STOP]
    if len(stop_cols) <= 1:
        return [(tfields, line_order)]
    col_x0 = cells.groupby("col_id")["x0"].min()
    boundaries = sorted(col_x0[c] for c in stop_cols)[1:]
    bucket = np.searchsorted(np.asarray(boundaries), tfields["x0"].to_numpy(),
                             side="right")
    out = []
    for b in range(len(stop_cols)):
        part = tfields[bucket == b]
        if part.empty:
            continue
        lines = [lid for lid in line_order
                 if lid in set(part["line_id"].tolist())]
        out.append((part, lines))
    return out
