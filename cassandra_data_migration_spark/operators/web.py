"""URL / domain operators for web-corpus curation.

A crawled training corpus is keyed by URL: per-domain statistics and
per-domain quotas are the levers that keep one giant host from
dominating the mixture (the Common-Crawl-style "domain cap").  The
``documents`` fixture has no URL column, so :func:`synthesize_url`
derives one deterministically from (source, lang, doc_id) — both
engines (Spark and the DuckDB oracle) regenerate identical URLs, the
same convention as the seeded generators in ``generate.py``
(reference analogue: synthetic data generation,
lab/scripts/generate_data.py:29-66).

Scale notes
-----------
- URL parsing is a narrow scan-side projection (built-in
  ``parse_url`` / ``substring_index`` — JVM codegen, no UDF): free at
  any scale.
- ``domain_stats`` is one hash aggregation with map-side combine; the
  shuffle carries one row per domain per task.
- ``domain_quota_sample`` shuffles once on the domain and ranks
  within it.  A pathological domain holding billions of rows makes a
  single reducer hot; the two-phase fix is a hash-threshold pre-filter
  (keep rows with ``md5_bucket < c·cap/est_count`` per heavy domain —
  an over-sample) followed by the exact rank, which bounds any
  reducer's input to ~c·cap rows.  At the fixture scale the direct
  rank is the right plan, so the pre-filter is not applied here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cassandra_data_migration_spark.functions.hashing import md5_draw

_TLDS = ["com", "org", "net"]


def synthesize_url(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    lang_col: str = "lang",
    out: str = "url",
) -> DataFrame:
    """Deterministic URL per document:
    ``https://www.{source}-site.{tld}/{lang}/{id%37}/doc-{id}.html?ref=r{id%5}``
    with the TLD drawn by ``id % 3``.  Pure integer/string expressions
    so any engine regenerates the identical value."""
    tld = F.element_at(
        F.array(*[F.lit(t) for t in _TLDS]),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    url = F.concat(
        F.lit("https://www."),
        F.col(source_col),
        F.lit("-site."),
        tld,
        F.lit("/"),
        F.col(lang_col),
        F.lit("/"),
        (F.col(id_col) % 37).cast("string"),
        F.lit("/doc-"),
        F.col(id_col).cast("string"),
        F.lit(".html?ref=r"),
        (F.col(id_col) % 5).cast("string"),
    )
    return df.withColumn(out, url)


def registered_domain(host: Column) -> Column:
    """Last two labels of the host (``a.b.c`` → ``b.c``) — the
    site-level grouping key.  (A production system would consult the
    public-suffix list; two labels is the fixture-correct rule.)"""
    return F.substring_index(host, ".", -2)


def parse_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Split a URL into protocol / host / registered domain / path /
    query via the built-in ``parse_url`` — scan-side, no UDF."""
    u = F.col(url_col)
    host = F.parse_url(u, F.lit("HOST"))
    return df.withColumn("protocol", F.parse_url(u, F.lit("PROTOCOL"))).withColumn(
        "host", host
    ).withColumn("domain", registered_domain(host)).withColumn(
        "path", F.parse_url(u, F.lit("PATH"))
    ).withColumn("query_string", F.parse_url(u, F.lit("QUERY")))


def domain_stats(
    df: DataFrame, domain_col: str = "domain", chars_col: str = "n_chars"
) -> DataFrame:
    """Per-domain corpus profile: doc count, char volume, language
    spread.  One grouped aggregation; every measure map-side combines
    (count/sum/HLL partials), so the shuffle is O(domains)."""
    return df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(chars_col).alias("total_chars"),
        F.round(F.avg(chars_col), 2).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


def domain_quota_sample(
    df: DataFrame,
    cap: int,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    salt: str = "quota",
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, chosen by a
    deterministic md5 draw (not arrival order — re-crawls keep the
    same survivors).  Rank is a pure function of the row, so the
    result is stable across partitionings and engines."""
    w = Window.partitionBy(domain_col).orderBy(
        md5_draw(salt, id_col), F.col(id_col)
    )
    return (
        df.withColumn("quota_rank", F.row_number().over(w))
        .filter(F.col("quota_rank") <= cap)
        .select(F.col(domain_col).alias("domain"), id_col, "quota_rank")
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for URL-level dedup (the CommonCrawl /
    refinement-pipeline convention): lowercase, strip the query string
    and fragment (tracking params like ``?ref=…``), drop a leading
    ``www.`` host label and default ``:80``/``:443`` ports, and reduce
    the path to its directory (the trailing file segment is the
    per-capture name; the directory is the resource identity).

    Pure ``regexp_replace`` chain — evaluated in the scan stage, no
    UDF, no shuffle.  Each pattern matches at most once so the
    replace-first (DuckDB) vs replace-all (Spark) difference cannot
    bite."""
    u = F.lower(url)
    u = F.regexp_replace(u, r"[?#].*$", "")
    u = F.regexp_replace(u, r"://www\.", "://")
    u = F.regexp_replace(u, r":(80|443)/", "/")
    return F.regexp_replace(u, r"/[^/]*$", "/")


def url_canonical_groups(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup report: group documents by canonical URL, keep
    the smallest id as the survivor, count the casualties.  One grouped
    aggregation on the canonical key — O(groups) shuffle, map-side
    combined; the text column never moves."""
    return (
        df.select(canonicalize_url(F.col(url_col)).alias("canonical_url"), id_col)
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
        .withColumn("n_dropped", (F.col("n_docs") - 1).cast("bigint"))
    )


def blocklist_filter(
    df: DataFrame,
    blocked_domains: list[str],
    blocked_patterns: list[str] | None = None,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """UT1/adult-blocklist-style corpus filtering (the standard web-
    corpus safety gate, cf. the RefinedWeb/CCNet pipelines): drop a
    document when its registered domain — or ANY parent suffix of its
    host — is blocklisted, or its URL matches a blocked path pattern.
    Returns the survivors.

    Suffix semantics: blocking ``example.com`` also blocks
    ``a.b.example.com`` (how UT1 lists are applied).  The host's
    suffix set is a scan-side array fold over its dot-split labels;
    each suffix probes the BROADCAST blocklist (even UT1's ~4M
    entries are tens of MB).  Plan: explode(≤ label-count per row) →
    broadcast semi join → distinct blocked ids → one id-keyed
    left-anti join back.  The corpus text shuffles ZERO times — only
    ids move, and AQE broadcasts the blocked-id side when it is small
    (the normal case).

    Pattern rules are a codegen'd ``rlike`` AND-NOT chain, evaluated
    in the scan; keep the rule count bounded (regexes compile per
    task)."""
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # ["a","b","example","com"] -> ["a.b.example.com", "b.example.com",
    # "example.com", "com"]
    suffixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    bl = df.sparkSession.createDataFrame(
        [(d.lower(),) for d in blocked_domains], "blocked_suffix string"
    )
    blocked_ids = (
        df.select(id_col, F.explode(suffixes).alias("_sfx"))
        .join(F.broadcast(bl), F.col("_sfx") == F.col("blocked_suffix"),
              "left_semi")
        .select(id_col)
        .distinct()
    )
    out = df.join(blocked_ids, on=id_col, how="left_anti")
    for pat in blocked_patterns or []:
        out = out.filter(~F.col(url_col).rlike(pat))
    return out
