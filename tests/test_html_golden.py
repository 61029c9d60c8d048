"""Golden-file tests pinning html_to_text against REAL page archetypes.

VERDICT_r6 item 3: the ``html_text_extract`` oracle applies the IDENTICAL
``HTML_TEXT_RULES`` chain on both engines, so its green hash proves
cross-engine regex equivalence — not that the extraction is GOOD on real
pages. These tests break that circle on four committed fixtures
(tests/fixtures/html_pages/) chosen to cover the archetypes a crawl
actually serves:

  * ``wiki_article.html``  — nav-heavy + infobox/wikitable tables
  * ``news_story.html``    — script-injected (analytics, JSON-LD, cookie
                             banner, ad loader) + nav + aside furniture
  * ``product_specs.html`` — table-heavy spec sheet + form + footer links
  * ``dev_blog.html``      — entity-heavy (&lt;tag&gt; as prose, code
                             samples, blockquote)

Three layers, strongest first:

1. HAND-ASSERTED properties — expectations written from reading the HTML,
   never from running the chain: script/style/comment payloads must be
   gone, real prose sentences must survive verbatim, the five named
   entities + &nbsp; must decode, block structure must land as line
   breaks, no raw markup may remain.
2. GOLDEN equality — the full extracted text is pinned to a committed
   .golden.txt, so any rule-chain change shows up as a reviewable diff
   of real-page output (regenerate deliberately with
   tests/fixtures/html_pages/regen_goldens.py, then re-review layer 1).
3. CROSS-ENGINE replay — DuckDB applies ``html_rules_sql`` to the same
   fixture bytes and must reproduce the golden exactly, extending the
   oracle-equivalence proof from the synthetic corpus to real pages.

Any intentional rule-chain fix must keep HTML_TEXT_RULES as the single
shared source so the ``html_text_extract`` oracle row stays green.
"""

from __future__ import annotations

import glob
import os

import pytest

from hbase_packet_inspector_spark.operators.web import (
    html_rules_sql,
    html_to_text,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "html_pages")


def _extract(spark, name: str):
    body = open(os.path.join(FIXDIR, name)).read()
    df = spark.createDataFrame([(body,)], "body string")
    return html_to_text(df).select("text", "markup_frac").collect()[0]


def _golden(name: str) -> str:
    return open(os.path.join(FIXDIR, name)).read()


ALL_PAGES = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(FIXDIR, "*.html"))
)


def test_fixture_inventory():
    assert ALL_PAGES == [
        "dev_blog.html", "news_story.html", "product_specs.html",
        "wiki_article.html",
    ]
    for p in ALL_PAGES:
        assert os.path.isfile(
            os.path.join(FIXDIR, p.replace(".html", ".golden.txt"))
        )


@pytest.mark.parametrize(
    "page", [p for p in ALL_PAGES if p != "dev_blog.html"]
)
def test_no_markup_survives(spark, page):
    """No raw tag fragments, attributes, or script/style payloads in the
    output — hand-derived invariants of a correct strip. dev_blog.html is
    excluded: there, ESCAPED markup (&lt;/dialog&gt; etc.) is the prose
    itself and legitimately decodes to tag-shaped text; its targeted test
    covers that page."""
    text = _extract(spark, page).text
    assert "</" not in text
    assert "href=" not in text and "class=" not in text
    assert "{" not in text  # CSS/JS blocks gone wholesale
    assert "function(" not in text and "document." not in text


def test_wiki_nav_tables_and_structure(spark):
    r = _extract(spark, "wiki_article.html")
    lines = r.text.split("\n")
    # nav items land on their own lines (li -> newline), in order
    for item in ("Main page", "Contents", "Current events", "About"):
        assert item in lines
    # infobox row flattens to "label value" on one line
    assert "Developer(s) Apache Software Foundation" in lines
    assert "License Apache License 2.0" in lines
    # wikitable data row survives as a line
    assert "1.6 2016-01-04 1.6.3" in lines
    # body prose survives verbatim; &#39; decoded
    assert ("Apache Spark is an open-source unified analytics engine"
            in r.text)
    assert "Berkeley's\nAMPLab starting in 2009" in r.text
    # &nbsp; decoded to a plain space in the footer timestamp
    assert "at 18:04 (UTC)." in r.text
    # inline style + script payloads gone
    assert "navbox" not in r.text and "wgPageName" not in r.text
    # roughly half this page is markup (hand-reasoned band)
    assert 0.40 <= r.markup_frac <= 0.60


def test_news_scripts_jsonld_and_banner(spark):
    r = _extract(spark, "news_story.html")
    # three separate script bodies (JSON-LD, gtag config, ad injector)
    # must vanish wholesale
    for leak in ("NewsArticle", "dataLayer", "anonymize_ip",
                 "consentState", "appendChild", "paywall-overlay"):
        assert leak not in r.text, leak
    # the HTML comment is gone
    assert "OneTrust" not in r.text
    # article prose survives verbatim, across an entity boundary
    assert ("demand reached an all-time high of 82.4 gigawatts"
            in r.text)
    assert '"We asked consumers to defer heavy appliance use' in r.text
    assert "filings" in r.text and "charger" not in r.text  # right page
    # &amp; decodes in running prose
    assert "preliminary figures & operator filings" in r.text
    # cookie-banner + nav furniture REMAINS (this extractor is the step
    # BEFORE boilerplate_lines; furniture must land on separable lines)
    lines = r.text.split("\n")
    assert "Home Politics Business Climate Sport Culture Subscribe" \
        not in lines[0]  # not glued to the title line
    assert any("Accept all" in l for l in lines)
    assert 0.40 <= r.markup_frac <= 0.65


def test_product_tables_flatten_rowwise(spark):
    r = _extract(spark, "product_specs.html")
    lines = r.text.split("\n")
    # every spec row is its own "label value" line
    assert "Voltage 48 V DC" in lines
    assert "Max torque (hard) 85 Nm" in lines
    assert "Weight incl. battery 1.9 kg" in lines
    # &lt; decodes inside a table cell; &sup2; passes through (documented:
    # only the five named entities + &nbsp; decode)
    assert any(l.startswith("Vibration, drilling in metal <2.5") for l in lines)
    assert "&sup2;" in r.text
    # prose with &amp; and &#39;
    assert "a 45-minute rapid charger & a stackable carry case" in r.text
    assert "What's in the box" in lines
    # form chrome contributes only its visible button label
    assert "Search" in lines and "placeholder" not in r.text
    assert 0.35 <= r.markup_frac <= 0.60


def test_blog_escaped_tags_render_as_prose(spark):
    r = _extract(spark, "dev_blog.html")
    # &lt;dialog&gt; is CONTENT here — decoding after tag removal must
    # render it as text, not resurrect (and then strip) markup
    assert "Why your <dialog> element focus-traps wrong" in r.text
    assert "<fancy-button label=\"Delete\" autofocus>" in r.text
    # code sample survives line-for-line (pre is not a block-break tag,
    # but the embedded newlines are literal text)
    assert "dlg.showModal();" in r.text
    assert "requestAnimationFrame" in r.text
    # blockquote content kept, on its own lines
    assert "Rule of thumb: if a11y behaviour depends on" in r.text
    # style payload gone
    assert "JetBrains" not in r.text
    # code-heavy page keeps most of its bytes (hand-reasoned band)
    assert 0.15 <= r.markup_frac <= 0.45


@pytest.mark.parametrize("page", ALL_PAGES)
def test_golden_equality(spark, page):
    """Full-text regression pin: a rule-chain change must show up as a
    reviewable diff of real-page output."""
    got = _extract(spark, page).text
    want = _golden(page.replace(".html", ".golden.txt"))
    assert got == want, f"{page}: extracted text drifted from golden"


@pytest.mark.parametrize("page", ALL_PAGES)
def test_duckdb_reproduces_golden(page):
    """Cross-engine replay on REAL pages: DuckDB's html_rules_sql chain
    must reproduce the committed golden byte-for-byte — the
    html_text_extract oracle equivalence, extended beyond the synthetic
    corpus."""
    import duckdb

    body = open(os.path.join(FIXDIR, page)).read()
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {html_rules_sql('body')} AS t FROM "
        "(SELECT ? AS body)", [body]
    ).fetchone()[0]
    assert got == _golden(page.replace(".html", ".golden.txt"))
