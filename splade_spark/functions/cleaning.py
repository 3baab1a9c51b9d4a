"""Web-corpus cleaning operators: URL canonicalization/dedup and PII
scrubbing — the ingest-side hygiene a Common-Crawl-scale pipeline runs
before indexing (not in the reference, whose MS MARCO corpus is
pre-cleaned; reference analog of the url key itself is the docid map,
task/evaluator.py:242-243).

Everything is JVM regexp/string column expressions (codegen,
embarrassingly parallel, no shuffle until the dedup groupBy); each
operator has an exact DuckDB twin in sql_oracle.py. Regexes are kept
in the RE2-compatible subset (no lookaround) so Java and DuckDB
produce identical rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic messy-URL fixture: the sandbox pages table's urls are
# uniform doc:// ids, so variant synthesis is part of the operator
# surface (mixed scheme case, www., host case, trailing slash,
# fragments; doc_id//2 collide onto one canonical page)
URL_VARIANTS_EXPR = (
    "concat("
    " CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END,"
    " CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN 'ExAmple' ELSE 'example' END,"
    " CAST(CAST(floor(doc_id / 2) AS INT) % 7 AS STRING), '.com/p/',"
    " CAST(CAST(floor(doc_id / 2) AS INT) AS STRING),"
    " CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END"
    ")"
)


def synth_messy_urls(documents: DataFrame) -> DataFrame:
    """(doc_id, url): deterministic messy variants over the corpus."""
    return documents.selectExpr("doc_id", f"{URL_VARIANTS_EXPR} AS url")


def normalize_url(col):
    """Canonical form: lowercase, scheme and leading www. stripped,
    fragment stripped, trailing slash stripped."""
    u = F.lower(col)
    u = F.regexp_replace(u, "^https?://", "")
    u = F.regexp_replace(u, "^www\\.", "")
    u = F.regexp_replace(u, "#.*$", "")
    return F.regexp_replace(u, "/$", "")


def url_dedup(pages: DataFrame) -> DataFrame:
    """(doc_id, url_norm, canonical_id, is_dup): group by canonical
    url, canonical = min doc_id — the url-level twin of exact_dedup.
    One shuffle on the normalized key."""
    normed = pages.select("doc_id", normalize_url(F.col("url")).alias("url_norm"))
    w = Window.partitionBy("url_norm")
    return (
        normed.withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("is_dup", (F.col("doc_id") != F.col("canonical_id")).cast("int"))
        .select("doc_id", "url_norm", "canonical_id", "is_dup")
    )


# PII patterns — RE2-safe (no lookaround); applied in a fixed order so
# engines rewrite identically (email first, then ipv4, then phone,
# which would otherwise swallow ip/phone digit runs differently)
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
PHONE_RE = "\\+[0-9][0-9() -]{6,}[0-9]"

# deterministic PII-bearing fixture text (corpus text carries no PII)
PII_SUFFIX_EXPR = (
    "concat(' contact user', CAST(doc_id AS STRING), '@example.com',"
    " ' tel +1-555-010', CAST(doc_id % 10 AS STRING),"
    " ' ip 10.0.0.', CAST(doc_id % 256 AS STRING))"
)


def with_pii(documents: DataFrame) -> DataFrame:
    """(doc_id, text): corpus text with deterministic injected PII."""
    return documents.selectExpr(
        "doc_id", f"concat(text, {PII_SUFFIX_EXPR}) AS text"
    )


def scrub_pii(col):
    s = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    s = F.regexp_replace(s, IPV4_RE, "<IP>")
    return F.regexp_replace(s, PHONE_RE, "<PHONE>")


def pii_scrub(documents: DataFrame) -> DataFrame:
    """(doc_id, scrubbed): emails, IPv4s, then international-format
    phone numbers replaced by typed placeholder tokens."""
    return documents.select("doc_id", scrub_pii(F.col("text")).alias("scrubbed"))
