"""Frozen extraction config.

Mirrors the default values of the reference's YAML config that the
extraction kernel reads (reference: src/pdf2gtfs/config.template.yaml).
In Spark this struct is closed over by the Arrow kernel (broadcast by
value with the serialized UDF — it is tiny and immutable).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence, Tuple


def _default_header_values() -> Mapping[str, str]:
    # reference: config.template.yaml "header_values"
    return {
        "montag - freitag": "0,1,2,3,4",
        "samstag": "5",
        "sonntag": "6",
        "sonn- und feiertag": "6,h",
        "sonn- / feiertag": "6,h",
    }


def _default_abbreviations() -> Mapping[str, str]:
    # reference: config.template.yaml "name_abbreviations"
    return {
        "a.": "am",
        "rh.": "rhein",
        "ffm": "frankfurt",
        "st.": "sankt",
        "hbf": "hauptbahnhof",
        "bf": "bahnhof",
        "str.": "strasse",
        "ka": "karlsruhe",
    }


@dataclass(frozen=True)
class ExtractConfig:
    """Keys the kernel reads; defaults = reference defaults.

    reference: src/pdf2gtfs/config.template.yaml (values cited per field).
    """

    # config.template.yaml:31
    time_format: str = "%H.%M"
    # config.template.yaml header_values block
    header_values: Mapping[str, str] = field(
        default_factory=_default_header_values)
    # negative_header_values
    negative_header_values: Tuple[str, ...] = (":", "=")
    # annot_identifier
    annot_identifier: Tuple[str, ...] = (
        "Verkehrshinweis", "Verkehrsbeschränkung", "Verkehrshinweise")
    # route_identifier
    route_identifier: Tuple[str, ...] = ("Linie", "Zugnummer", "Fahrtnummer")
    # repeat_identifier: list of (start, end) keyword pairs
    repeat_identifier: Tuple[Tuple[str, str], ...] = (
        ("alle", "min"), ("alle", "min."))
    arrival_identifier: Tuple[str, ...] = ("an",)
    departure_identifier: Tuple[str, ...] = ("ab",)
    name_abbreviations: Mapping[str, str] = field(
        default_factory=_default_abbreviations)
    allowed_stop_chars: Tuple[str, ...] = (" ",)
    # geometric / structural thresholds
    min_cell_overlap: float = 0.8          # config.template.yaml:304
    stop_min_mean_normed_length: int = 3   # :334
    stop_letter_ratio: float = 0.8         # :345
    max_row_distance: float = 3.0          # :363
    max_char_distance: float = 0.01        # :369
    min_row_count: int = 5                 # :375
    min_connection_count: int = 1
    repeat_strategy: str = "cycle"         # "cycle" | "mean"
    # --- new (default) extraction path knobs -------------------------
    # which kernel to run per turn: the reference's current engine
    # ("new": probabilistic cell typing + table expansion,
    # table/table.py) or the pre-rewrite one ("legacy",
    # --use_legacy_extraction). Legacy stays our default so the golden
    # CSV fixtures (which encode legacy semantics) remain byte-exact.
    extraction_path: str = "legacy"        # "legacy" | "new"
    table_expansion_directions: str = "NW"  # config.template.yaml:271
    split_orientations: str = "VH"          # config.template.yaml:260
    extra_greedy: bool = True               # config.template.yaml:278
    merge_split_tables: bool = False        # config.template.yaml:318


DEFAULT_CONFIG = ExtractConfig()
