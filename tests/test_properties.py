"""Property-based tests (hypothesis) for the kernel's pure functions.

The reference has no randomized testing (SURVEY.md §5 'Absent'); these
pin the invariants the distributed pipeline depends on: codec
round-trips, strptime-equivalence of the compiled time regex, and
normalization idempotence.
"""

import string
from time import strptime

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2gtfs_spark.config import DEFAULT_CONFIG
from pdf2gtfs_spark.kernel.payload import (
    PageBox, decode_payload, encode_chars,
)
from pdf2gtfs_spark.kernel.timefmt import (
    is_time_str, match_times, seconds_to_gtfs, gtfs_to_seconds,
    time_format_to_regex,
)
from pdf2gtfs_spark.functions.normalize import normalize_name

_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + "äöüß.-,: ",
    min_size=1, max_size=12).map(str.strip).filter(bool)
# payload wire format is tab/newline-delimited
_TEXT_WIRE = _TEXT.filter(lambda s: "\t" not in s and "\n" not in s)


class TestPayloadRoundTrip:
    @given(st.lists(st.tuples(
        st.floats(0, 500, allow_nan=False),
        st.floats(0, 500, allow_nan=False),
        st.floats(0.125, 20, allow_nan=False),
        st.floats(0.125, 20, allow_nan=False),
        _TEXT_WIRE.map(lambda s: s[0])), min_size=0, max_size=40))
    @settings(max_examples=50, deadline=None)
    def test_encode_decode_roundtrip(self, boxes):
        chars = pd.DataFrame(
            [(round(x, 2), round(y, 2), round(x + w, 2), round(y + h, 2), t)
             for x, y, w, h, t in boxes],
            columns=["x0", "y0", "x1", "y1", "text"])
        page = PageBox(0.0, 0.0, 1000.0, 1000.0)
        payload = encode_chars(page, chars)
        page2, decoded = decode_payload(payload)
        assert (page2.x0, page2.y1) == (page.x0, page.y1)
        assert len(decoded) == len(chars)
        if len(chars):
            assert list(decoded["text"]) == list(chars["text"])
            assert np.allclose(decoded["x0"], chars["x0"])


class TestTimeRegexEquivalence:
    @given(st.text(alphabet="0123456789.: ", min_size=1, max_size=7))
    @settings(max_examples=300, deadline=None)
    def test_matches_strptime(self, text):
        """The compiled regex + bounds must accept exactly the strings
        strptime(Config.time_format) accepts (celltype.py:175-186)."""
        fmt = DEFAULT_CONFIG.time_format
        regex, order = time_format_to_regex(fmt)
        try:
            strptime(text, fmt)
            expected = True
        except ValueError:
            expected = False
        assert is_time_str(text, regex, order) == expected
        got = match_times(pd.Series([text]), fmt)[0].iloc[0]
        assert bool(got) == expected

    @given(st.integers(0, 99 * 3600 + 59 * 60 + 59))
    @settings(max_examples=100, deadline=None)
    def test_gtfs_time_roundtrip(self, seconds):
        assert gtfs_to_seconds(seconds_to_gtfs(seconds)) == seconds


class TestNormalizeIdempotent:
    @given(_TEXT)
    @settings(max_examples=150, deadline=None)
    def test_idempotent(self, name):
        once = normalize_name(name)
        assert normalize_name(once) == once

    @given(_TEXT)
    @settings(max_examples=100, deadline=None)
    def test_word_order_invariant(self, name):
        words = name.split()
        if len(words) < 2:
            return
        reordered = " ".join(reversed(words))
        assert normalize_name(name) == normalize_name(reordered)
