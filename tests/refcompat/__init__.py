"""Import shim for the actual reference implementation, used by the
differential tests (tests/test_ref_differential.py).

The reference's table engine (/root/reference/src/pdf2gtfs/
datastructures/table/) is pure Python + pandas, but its import closure
pulls four third-party packages that are absent in this sandbox:
``more_itertools``, ``pdfminer``, ``custom_conf`` and ``holidays``.
This module installs minimal stand-ins for exactly the names the
closure touches, then imports the real reference modules so both
engines can run side by side on identical inputs.

The stand-ins are written from the public documented semantics of
those libraries (more-itertools docs; pdfminer/holidays are
type-surface only; custom_conf is reconstructed from how
pdf2gtfs/config uses it), not copied from them.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REF_SRC = Path("/root/reference/src")

_loaded: dict | None = None


def _mk(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


# ---------------------------------------------------------------------------
# more_itertools (the 8 functions the reference closure calls)
# ---------------------------------------------------------------------------

def _install_more_itertools() -> None:
    if "more_itertools" in sys.modules:
        return
    import itertools

    m = _mk("more_itertools")

    def first_true(iterable, default=None, pred=None):
        return next(filter(pred, iterable), default)

    def flatten(list_of_lists):
        return itertools.chain.from_iterable(list_of_lists)

    def prepend(value, iterator):
        return itertools.chain([value], iterator)

    def partition(pred, iterable):
        if pred is None:
            pred = bool
        t1, t2 = itertools.tee(iterable)
        return (
            itertools.filterfalse(pred, t1),
            filter(pred, t2),
        )

    def always_iterable(obj, base_type=(str, bytes)):
        if obj is None:
            return iter(())
        if base_type is not None and isinstance(obj, base_type):
            return iter((obj,))
        try:
            return iter(obj)
        except TypeError:
            return iter((obj,))

    def split_when(iterable, pred, maxsplit=-1):
        if maxsplit == 0:
            yield list(iterable)
            return
        it = iter(iterable)
        try:
            cur = [next(it)]
        except StopIteration:
            return
        for item in it:
            if pred(cur[-1], item):
                yield cur
                if maxsplit == 1:
                    yield [item] + list(it)
                    return
                maxsplit -= 1
                cur = []
            cur.append(item)
        yield cur

    def collapse(iterable, base_type=None, levels=None):
        def walk(node, level):
            if (isinstance(node, (str, bytes))
                    or (base_type is not None
                        and isinstance(node, base_type))):
                yield node
                return
            if levels is not None and level >= levels:
                yield node
                return
            try:
                tree = iter(node)
            except TypeError:
                yield node
                return
            for child in tree:
                yield from walk(child, level + 1)

        yield from walk(iterable, -1)

    def substrings_indexes(seq, reverse=False):
        lengths = range(1, len(seq) + 1)
        if reverse:
            lengths = reversed(lengths)
        return ((seq[i:i + length], i, i + length)
                for length in lengths
                for i in range(len(seq) - length + 1))

    _marker = object()

    class peekable:
        def __init__(self, iterable):
            self._it = iter(iterable)
            self._cache = []

        def __iter__(self):
            return self

        def __next__(self):
            if self._cache:
                return self._cache.pop(0)
            return next(self._it)

        def peek(self, default=_marker):
            if not self._cache:
                try:
                    self._cache.append(next(self._it))
                except StopIteration:
                    if default is _marker:
                        raise
                    return default
            return self._cache[0]

        def __bool__(self):
            try:
                self.peek()
            except StopIteration:
                return False
            return True

    for fn in (first_true, flatten, prepend, partition, always_iterable,
               split_when, collapse, substrings_indexes, peekable):
        setattr(m, fn.__name__, fn)


# ---------------------------------------------------------------------------
# pdfminer (type surface only; never exercised — Cells are built directly)
# ---------------------------------------------------------------------------

def _install_pdfminer() -> None:
    if "pdfminer" in sys.modules:
        return
    _mk("pdfminer")

    layout = _mk("pdfminer.layout")
    for cls_name in ("LAParams", "LTAnno", "LTChar", "LTPage", "LTText",
                     "LTTextLine"):
        setattr(layout, cls_name, type(cls_name, (), {}))

    pdffont = _mk("pdfminer.pdffont")
    pdffont.PDFFont = type("PDFFont", (), {})

    high_level = _mk("pdfminer.high_level")

    def extract_pages(*args, **kwargs):
        raise NotImplementedError("pdfminer stub: no real PDF IO")

    high_level.extract_pages = extract_pages

    _mk("pdfminer.pdfcolor").PDFColorSpace = type("PDFColorSpace", (), {})
    _mk("pdfminer.pdfdocument").PDFDocument = type("PDFDocument", (), {})
    _mk("pdfminer.pdfinterp").PDFGraphicState = type(
        "PDFGraphicState", (), {})
    parser = _mk("pdfminer.pdfparser")
    parser.PDFParser = type("PDFParser", (), {})
    parser.PDFSyntaxError = type("PDFSyntaxError", (Exception,), {})
    _mk("pdfminer.utils").Matrix = tuple


# ---------------------------------------------------------------------------
# holidays (list_supported_countries is hit during config load;
# country_holidays during handler.generate_calendar_dates — served by a
# deterministic fake calendar that mirrors the repo's synthetic holiday
# dim, operators/feed.py HOLIDAY_MONTH_DAYS, so the GTFS differential
# compares like against like)
# ---------------------------------------------------------------------------

_FAKE_HOLIDAY_MONTH_DAYS = [(1, 1), (5, 1), (10, 3), (12, 25), (12, 26)]


def _install_holidays() -> None:
    if "holidays" in sys.modules:
        return
    import datetime as _dt

    _mk("holidays")
    utils = _mk("holidays.utils")

    def list_supported_countries(*args, **kwargs):
        return {"DE": ["BW", "BY", "BE"]}

    def country_holidays(country, subdiv=None, years=None, **kwargs):
        years = years or []
        return {_dt.date(y, m, d): f"fake-holiday-{m:02d}{d:02d}"
                for y in years for m, d in _FAKE_HOLIDAY_MONTH_DAYS}

    utils.list_supported_countries = list_supported_countries
    utils.country_holidays = country_holidays


# ---------------------------------------------------------------------------
# custom_conf (instance-descriptor config; reconstructed from usage in
# pdf2gtfs/config/{__init__,properties}.py)
# ---------------------------------------------------------------------------

def _install_custom_conf() -> None:
    if "custom_conf" in sys.modules:
        return
    import typing

    import yaml

    _mk("custom_conf")

    errors = _mk("custom_conf.errors")

    class PropertyError(Exception):
        def __init__(self, *args, **kwargs):
            super().__init__(*args)

    class InvalidPropertyTypeError(PropertyError):
        pass

    errors.PropertyError = PropertyError
    errors.InvalidPropertyTypeError = InvalidPropertyTypeError
    errors.INVALID_CONFIG_EXIT_CODE = 1

    _mk("custom_conf.properties")
    prop_mod = _mk("custom_conf.properties.property")

    class Property:
        def __init__(self, name, attr_type=None):
            self.name = name
            self.attr = "_" + name
            self.type = attr_type

        def __get__(self, obj, objtype=None):
            if obj is None:
                return self
            return getattr(obj, self.attr)

        def __set__(self, obj, value):
            self.validate(value)
            setattr(obj, self.attr, value)

        def validate(self, value):
            t = self.type
            if t is None:
                return
            origin = typing.get_origin(t)
            base = origin if origin is not None else t
            if not isinstance(base, type):
                return
            if base is float and isinstance(value, (int, float)) \
                    and not isinstance(value, bool):
                return
            if not isinstance(value, base):
                raise InvalidPropertyTypeError(
                    f"{self.name}: expected {base}, got {type(value)}")

    prop_mod.Property = Property
    prop_mod.CType = typing.TypeVar("CType")

    bp_mod = _mk("custom_conf.properties.bounded_property")

    class _BoundedProperty(Property):
        def __init__(self, name, attr_type, lower=None, upper=None):
            super().__init__(name, attr_type)
            self.lower = lower
            self.upper = upper

        def validate(self, value):
            super().validate(value)
            if self.lower is not None and value < self.lower:
                raise InvalidPropertyTypeError(
                    f"{self.name}: {value} < {self.lower}")
            if self.upper is not None and value > self.upper:
                raise InvalidPropertyTypeError(
                    f"{self.name}: {value} > {self.upper}")

    class IntBoundedProperty(_BoundedProperty):
        def __init__(self, name, lower=None, upper=None):
            super().__init__(name, int, lower, upper)

    class FloatBoundedProperty(_BoundedProperty):
        def __init__(self, name, lower=None, upper=None):
            super().__init__(name, float, lower, upper)

    bp_mod.BoundedProperty = _BoundedProperty
    bp_mod.IntBoundedProperty = IntBoundedProperty
    bp_mod.FloatBoundedProperty = FloatBoundedProperty

    config_mod = _mk("custom_conf.config")

    class BaseConfig:
        """Instance-descriptor config: Property objects assigned to
        instance attributes behave like descriptors (reads return the
        stored value, writes validate/transform)."""

        def __init__(self, load_default=True, load_all=True):
            self._initialize_config_properties()
            if load_default:
                self.load_config(self.default_config_path)

        def _initialize_config_properties(self):
            pass

        def load_config(self, path):
            with open(path, encoding="utf-8") as fil:
                data = yaml.safe_load(fil)
            for key, value in (data or {}).items():
                setattr(self, key, value)

        def __getattribute__(self, name):
            value = object.__getattribute__(self, name)
            if isinstance(value, Property):
                return value.__get__(self, type(self))
            return value

        def __setattr__(self, name, value):
            try:
                existing = object.__getattribute__(self, name)
            except AttributeError:
                existing = None
            if isinstance(existing, Property) \
                    and not isinstance(value, Property):
                existing.__set__(self, value)
                return
            object.__setattr__(self, name, value)

    config_mod.BaseConfig = BaseConfig


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

def _install_folium() -> None:
    """Type surface only: locate/finder/loc_nodes.py imports folium for
    its interactive map output, which the GTFS differential never
    renders."""
    if "folium" in sys.modules:
        return
    m = _mk("folium")
    for cls_name in ("Map", "Marker", "Icon", "Popup", "CircleMarker"):
        setattr(m, cls_name, type(cls_name, (), {}))


_loaded_gtfs: dict | None = None


def load_reference_gtfs() -> dict:
    """Handles for the reference GTFS output surface
    (datastructures/gtfs_output/): the GTFSHandler plus the legacy
    pdftable->TimeTable drivers.  Aligns Config.gtfs_date_bounds with
    the repo's FEED_DATE_BOUNDS so calendar/calendar_dates compare."""
    global _loaded_gtfs
    if _loaded_gtfs is not None:
        return _loaded_gtfs
    base = load_reference()
    _install_folium()

    from pdf2gtfs.datastructures.gtfs_output.handler import GTFSHandler
    from pdf2gtfs.reader import (
        get_pdf_tables_from_df, pdf_tables_to_timetables,
    )

    base["Config"].gtfs_date_bounds = ["20240101", "20251231"]
    _loaded_gtfs = {
        **base,
        "GTFSHandler": GTFSHandler,
        "get_pdf_tables_from_df": get_pdf_tables_from_df,
        "pdf_tables_to_timetables": pdf_tables_to_timetables,
    }
    return _loaded_gtfs


def reference_available() -> bool:
    return (REF_SRC / "pdf2gtfs" / "datastructures" / "table"
            / "table.py").exists()


def load_reference() -> dict:
    """Install the stand-ins, import the real reference modules and
    return the handles the differential tests need. Idempotent."""
    global _loaded
    if _loaded is not None:
        return _loaded
    if not reference_available():
        raise RuntimeError("reference source not found at " + str(REF_SRC))

    _install_more_itertools()
    _install_pdfminer()
    _install_holidays()
    _install_custom_conf()
    if str(REF_SRC) not in sys.path:
        sys.path.insert(0, str(REF_SRC))

    from pdf2gtfs.config import Config
    from pdf2gtfs.datastructures.pdftable.bbox import BBox
    from pdf2gtfs.datastructures.table.cell import Cell, EmptyCell
    from pdf2gtfs.datastructures.table.celltype import T
    from pdf2gtfs.datastructures.table.table import Table, merge_tables
    from pdf2gtfs.reader import assign_other_cells_to_tables

    _loaded = {
        "Config": Config,
        "BBox": BBox,
        "Cell": Cell,
        "EmptyCell": EmptyCell,
        "T": T,
        "Table": Table,
        "merge_tables": merge_tables,
        "assign_other_cells_to_tables": assign_other_cells_to_tables,
    }
    return _loaded
