"""DOM-heuristic boilerplate strip: kernel unit tests + the wrapped
oracle model (operators/htmlstrip.py contract)."""

from __future__ import annotations

import math

import pytest

from pdf2gtfs_spark.kernel.htmlstrip import (
    CHUNK, MIN_BLOCK_CHARS, N_BOILERPLATE_BLOCKS, strip_html,
    wrap_document,
)

LONG = "alpha beta gamma delta " * 4  # 92 chars, keepable


def test_basic_keep_and_title():
    r = strip_html(f"<html><head><title> T </title></head>"
                   f"<body><p>{LONG}</p></body></html>")
    assert r["title"] == "T"
    assert r["main_text"] == LONG.strip()
    assert r["n_kept"] == 1


def test_ancestor_tag_rule():
    doc = (f"<body><nav><p>{LONG}</p></nav><footer><div>{LONG}"
           f"</div></footer><p>{LONG}</p></body>")
    r = strip_html(doc)
    assert r["n_blocks"] == 3
    assert r["n_kept"] == 1
    assert r["main_text"] == LONG.strip()


def test_marker_class_and_id_rule():
    doc = (f'<body><div class="SideBar x">{LONG}</div>'
           f'<div id="promo-1">{LONG}</div>'
           f'<div class="content">{LONG}</div></body>')
    r = strip_html(doc)
    assert r["n_blocks"] == 3 and r["n_kept"] == 1


def test_marker_inherited_by_descendants():
    doc = (f'<body><div class="comments"><p>{LONG}</p><p>{LONG}</p>'
           f"</div></body>")
    assert strip_html(doc)["n_kept"] == 0


def test_marked_inline_span_taints_block():
    doc = f'<body><p>{LONG}<span class="ad">buy</span></p></body>'
    assert strip_html(doc)["n_kept"] == 0


def test_link_density_rule():
    linky = '<p>' + ' '.join(
        f'<a href="/{i}">link text number {i}</a>' for i in range(5)) + '</p>'
    mixed = f"<p>{LONG}<a href='/x'>tiny</a></p>"
    r = strip_html(f"<body>{linky}{mixed}</body>")
    assert r["n_blocks"] == 2 and r["n_kept"] == 1


def test_min_length_rule():
    r = strip_html("<body><p>short text.</p></body>")
    assert r["n_blocks"] == 1 and r["n_kept"] == 0


def test_whitespace_only_blocks_not_counted():
    r = strip_html(f"<body>\n  <div>\n <p>{LONG}</p>\n </div>\n</body>")
    assert r["n_blocks"] == 1


def test_nested_blocks_attribute_text_to_innermost():
    doc = (f"<body><div>outer text that is long enough to keep around"
           f"<p>{LONG}</p></div></body>")
    r = strip_html(doc)
    assert r["n_blocks"] == 2 and r["n_kept"] == 2
    # p closes first -> appears first
    assert r["main_text"].split("\n")[0] == LONG.strip()


def test_unclosed_tags_flushed_at_eof():
    r = strip_html(f"<body><p>{LONG}")
    assert r["n_kept"] == 1


def test_uppercase_tags_and_entities():
    r = strip_html(f"<BODY><P>{LONG}&amp; more &lt;ok&gt;</P></BODY>")
    assert r["main_text"].endswith("& more <ok>")


def test_script_and_style_dropped():
    doc = (f"<body><script>var x = 'looks like content text here';"
           f"</script><style>p {{ color: red }}</style>"
           f"<p>{LONG}</p></body>")
    r = strip_html(doc)
    assert r["n_kept"] == 1 and r["main_text"] == LONG.strip()


@pytest.mark.parametrize("n_words", [3, 12, 40, 80])
def test_wrapped_page_matches_oracle_model(n_words):
    """The closed-form model the DuckDB oracle implements."""
    text = ("word" + " tok" * n_words).strip()
    r = strip_html(wrap_document(42, text))
    chunks = [text[i:i + CHUNK].strip()
              for i in range(0, len(text), CHUNK)]
    non_empty = [c for c in chunks if c]
    kept = [c for c in non_empty if len(c) >= MIN_BLOCK_CHARS]
    assert r["title"] == "Doc 42"
    assert r["n_blocks"] == N_BOILERPLATE_BLOCKS + len(non_empty)
    assert r["n_kept"] == len(kept)
    assert r["main_text"] == "\n".join(kept)
    assert math.ceil(len(text) / CHUNK) == len(chunks)


def test_wrapper_escapes_markup_in_content():
    text = "a <p>&amp; tricky</p> literal markup in the raw text " * 2
    r = strip_html(wrap_document(1, text.strip()))
    assert r["main_text"] == text.strip()
    assert r["n_blocks"] == N_BOILERPLATE_BLOCKS + 1
