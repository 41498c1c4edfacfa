r"""HTML parse operators (reference: index/core/parser.go:16-37).

Pure column expressions — Catalyst keeps these inside whole-stage codegen;
no Python runs. Semantics reproduced exactly:

- title = first ``(?ism)<title.*?>(.*?)</title>`` submatch, trimmed;
  a document with no <title> is DROPPED entirely (parser.go:26-28 returns
  nil → skipped at indexer.go:227-229).
- body = document with comments / script / style / title blocks / all tags
  replaced by a single space, whitespace runs collapsed, trimmed.

Java regex notes: Go's ``(?ism)`` maps to Java inline flags ``(?ism)`` too
(i: case-insensitive, s: dotall, m: multiline); Go's ``.`` never matches
``\n`` unless ``s`` — same as Java. ``\s`` classes agree on ASCII space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TITLE_RE = r"(?ism).*?<title.*?>(.*?)</title>.*"
_HAS_TITLE_RE = r"(?ism)<title.*?>.*?</title>"
_TRIM_TAG_RE = r"(?ism)<!--.*?-->|<script.*?>.*?</script>|<style.*?>.*?</style>|<title.*?>.*?</title>|<.+?>"
_TRIM_SPACE_RE = r"(?m)\s+"


def _trim_space(c: Column) -> Column:
    """Go strings.TrimSpace — trims ALL whitespace, unlike Spark's trim()
    which only strips 0x20."""
    return F.regexp_replace(c, r"(?s)^\s+|\s+$", "")


def html_title(content: Column) -> Column:
    """First <title> submatch, trimmed (parser.go:17,25-29)."""
    return _trim_space(F.regexp_extract(content, r"(?is)<title.*?>(.*?)</title>", 1))


def has_title(content: Column) -> Column:
    return content.rlike(_HAS_TITLE_RE)


def html_body(content: Column) -> Column:
    """Tag-stripped, whitespace-collapsed body (parser.go:18-19,31-35)."""
    stripped = F.regexp_replace(content, _TRIM_TAG_RE, " ")
    return _trim_space(F.regexp_replace(stripped, _TRIM_SPACE_RE, " "))


def parse_html_documents(df: DataFrame, content_col: str = "content") -> DataFrame:
    """(.., content) -> (.., title, body); docs without <title> dropped."""
    c = F.col(content_col)
    return (
        df.filter(has_title(c))
        .withColumn("title", html_title(c))
        .withColumn("body", html_body(c))
    )
