"""sitemaps.org sitemap.xml parsing — crawl frontier seeding.

The third leg of the crawl-policy front door: robots.txt declares
global ``Sitemap:`` URLs (``operators/robots.py:parse_robots_extras``),
the sitemap documents themselves enumerate the URLs a polite crawler
seeds its frontier with (``crawl_frontier_schedule`` consumes them).
This implements the sitemaps.org 0.9 protocol shape: an ``<urlset>``
of ``<url>`` entries each carrying ``<loc>`` (required; XML
entity-escaped, surrounding whitespace tolerated) and the optional
``<lastmod>``/``<changefreq>``/``<priority>`` hints, or a
``<sitemapindex>`` of nested ``<sitemap><loc>`` pointers.

Spark shape: the whole parse is JVM expressions — ``regexp_extract_all``
over the document, ``transform`` over the per-entry blocks,
``posexplode`` to rows — so it rides whole-stage codegen with ZERO
Python in the hot path, and explode is a narrow op: no shuffle at any
frontier size. The spec caps one sitemap at 50k URLs / 50 MB, so a
per-document block array is bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# entity unescape order matters: '&amp;' LAST, so '&amp;lt;' correctly
# yields the literal '&lt;' instead of '<'
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def xml_unescape(col: Column) -> Column:
    """The five XML 1.0 predefined entities, '&amp;' last."""
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _tag(block: Column, tag: str) -> Column:
    """``<tag>...</tag>`` content: dotall (values may wrap), padding
    whitespace trimmed per the spec's whitespace tolerance, absent or
    empty tag -> NULL."""
    got = F.regexp_extract(block, f"(?s)<{tag}\\s*>\\s*(.*?)\\s*</{tag}\\s*>", 1)
    return F.when(got != "", got)


def parse_sitemap(df, xml_col: str, carry: list[str]):
    """One row per ``<url>`` entry: ``(…carry, pos, loc, lastmod,
    changefreq, priority, is_index)``. ``loc`` is entity-unescaped;
    ``priority`` is a DOUBLE (the spec's 0.0-1.0 hint); a
    ``<sitemapindex>`` document instead yields its nested sitemap
    ``<loc>`` pointers with ``is_index = true`` so the caller can
    recurse the fetch. Entries without a ``<loc>`` are dropped (the
    spec requires it). Pure JVM expressions end-to-end."""
    xml = F.col(xml_col)
    is_index = xml.rlike("<sitemapindex[\\s>]")
    blocks = F.when(
        is_index,
        F.expr(f"regexp_extract_all({xml_col}, '(?s)<sitemap\\\\s*>(.*?)</sitemap\\\\s*>', 1)"),
    ).otherwise(
        F.expr(f"regexp_extract_all({xml_col}, '(?s)<url\\\\s*>(.*?)</url\\\\s*>', 1)")
    )
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            xml_unescape(_tag(b, "loc")).alias("loc"),
            _tag(b, "lastmod").alias("lastmod"),
            _tag(b, "changefreq").alias("changefreq"),
            _tag(b, "priority").cast("double").alias("priority"),
        ),
    )
    out = df.select(
        *carry,
        is_index.alias("is_index"),
        F.posexplode(entries).alias("pos", "entry"),
    )
    return out.filter(F.col("entry.loc").isNotNull()).select(
        *carry,
        "pos",
        F.col("entry.loc").alias("loc"),
        F.col("entry.lastmod").alias("lastmod"),
        F.col("entry.changefreq").alias("changefreq"),
        F.col("entry.priority").alias("priority"),
        "is_index",
    )
