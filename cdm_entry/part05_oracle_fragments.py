"""Shared DuckDB oracle fragments (md5 draw, cosine, shingles, kmeans replay) used across the oracle registrations.

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry.part04b_pipeline_queries2 import *  # noqa: F401,F403

# --- shared oracle SQL fragments (DuckDB dialect) ---

from cassandra_data_migration_spark.functions.hashing import (  # noqa: E402
    md5_draw_sql as _md5_draw_sql,
)

# deterministic URL synthesis twin of operators/web.synthesize_url:
# sitedom = registered domain "{source}-site.{tld}", tld by doc_id % 3
_URL_CTE = """
    SELECT doc_id, lang, source, n_chars,
           source || '-site.' ||
               (['com','org','net'])[CAST(doc_id % 3 AS INT) + 1] AS sitedom
    FROM documents
"""

# product-quantization twins of operators/similarity.pq_encode: 32
# codebook rows by (md5(id), id), 8 subspaces of 8 dims, argmin key
# c·c − 2·x·c (squared-L2 minus the constant x·x), e4 fixed-point
# compare, ties to smallest cid
_PQ_CTES = """
    cb AS (
        SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
               embedding::DOUBLE[] AS cv
        FROM (SELECT vec_id, embedding FROM embeddings
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32)
    ),
    subs AS (SELECT unnest(range(8)) AS j),
    csl AS (SELECT cid, j, list_slice(cv, j*8+1, j*8+8) AS c FROM cb, subs),
    vsl AS (
        SELECT vec_id, j, list_slice(embedding::DOUBLE[], j*8+1, j*8+8) AS x
        FROM embeddings, subs
    ),
    dist AS (
        SELECT vec_id, j, cid,
               CAST(floor((list_dot_product(c, c) - 2.0 * list_dot_product(x, c))
                          * 10000.0 + 0.5) AS BIGINT) AS d2
        FROM vsl JOIN csl USING (j)
    ),
    codes AS (
        SELECT vec_id, j, list_position(arr, list_min(arr)) - 1 AS code
        FROM (SELECT vec_id, j, list(d2 ORDER BY cid) AS arr
              FROM dist GROUP BY vec_id, j)
    )
"""


def _pagerank_oracle(iterations: int = 5) -> str:
    """Unrolled-CTE twin of operators/graph.pagerank over the
    synthesized domain link graph: one CTE per iteration, every
    division integer (`//`), so the fixpoint matches Spark's loop
    bit-for-bit."""
    it = ""
    prev = "r0"
    for k in range(1, iterations + 1):
        it += f""",
    r{k} AS (
        SELECT v.i AS id,
               (15000000000000 // (100 * v.n))
               + (85 * COALESCE(inc.s, 0)) // 100 AS r
        FROM idx v LEFT JOIN (
            SELECT e.dst AS id, SUM({prev}.r // d.outdeg) AS s
            FROM edges e
            JOIN {prev} ON {prev}.id = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        ) inc ON inc.id = v.i
    )"""
        prev = f"r{k}"
    return f"""
        WITH u AS ({_URL_CTE}),
        doms AS (SELECT DISTINCT sitedom AS domain FROM u),
        idx AS (SELECT domain,
                       ROW_NUMBER() OVER (ORDER BY domain) - 1 AS i,
                       (SELECT COUNT(*) FROM doms) AS n
                FROM doms),
        edges AS (
            SELECT src, dst FROM (
                SELECT i AS src, (i * 3 + 1) % n AS dst FROM idx
                UNION SELECT i, (i * 5 + 2) % n FROM idx
                UNION SELECT i, (i * 7 + 3) % n FROM idx
            ) WHERE src <> dst
        ),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        r0 AS (SELECT i AS id,
                      1000000000000 // (SELECT COUNT(*) FROM doms) AS r
               FROM idx){it}
        SELECT idx.domain, CAST({prev}.r AS BIGINT) AS rank_e12
        FROM idx JOIN {prev} ON {prev}.id = idx.i
    """


# e4 fixed-point twin of graph.dedup_survivors' quality blend: raw
# ratios, identical IEEE op order, floor(x·10⁴+0.5) — no decimal
# ROUND intermediates, so both engines produce the same BIGINT
_QUALITY_CTE = """
    q AS (
        SELECT doc_id,
               CAST(floor(
                   (0.7 * LEAST(len(string_split(text, ' ')) / 64.0, 1.0)
                  + 0.3 * LEAST(len(list_filter(string_split(text, ' '),
                        t -> list_contains(['the','a','of','to','and','in','is'], t)))
                        / len(string_split(text, ' ')) * 5.0, 1.0))
                   * 10000.0 + 0.5) AS BIGINT) AS quality_e4
        FROM documents
    )
"""


def _stratified_sample_oracle() -> str:
    from cassandra_data_migration_spark.operators.sampling import (
        stratified_bucket_sql,
    )

    bucket = stratified_bucket_sql("lang", "doc_id")
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE {bucket} < CASE lang
            WHEN 'en' THEN 3000 WHEN 'es' THEN 6000 WHEN 'de' THEN 6000
            ELSE 10000 END
    """


def _kmeans_oracle(
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    final_select: str | None = None,
) -> str:
    """Unrolled-CTE replay of operators/similarity.kmeans_fit: same
    md5-seeded init, e4 fixed-point assignment (argmin key c·c − 2·x·c,
    ties to smallest cid), DECIMAL(20,10)-sum centroid updates emitted
    as round(sum/count, 6), empty clusters keeping prior centroids.

    ``final_select`` replaces the default ``SELECT vec_id, cluster``
    tail; it may reference the CTEs ``v`` (vec_id, ev), ``cb{iters}``
    (cid, cv — the refined centroids) and ``a{iters}`` (vec_id,
    cluster — the final assignment), letting refined-IVF oracles
    (manifest counts, probe replays) build on the same engine-exact
    iteration chain."""
    ctes = [
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)",
        f"""cb0 AS (
            SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
                   embedding::DOUBLE[] AS cv
            FROM (SELECT vec_id, embedding FROM embeddings
                  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
        )""",
    ]
    for it in range(iters + 1):
        ctes.append(f"""d{it} AS (
            SELECT vec_id, cid,
                   CAST(floor((list_dot_product(cv, cv) - 2.0 * list_dot_product(ev, cv))
                              * 10000.0 + 0.5) AS BIGINT) AS dk
            FROM v, cb{it}
        )""")
        ctes.append(f"""a{it} AS (
            SELECT vec_id, cid AS cluster FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dk, cid) AS rn
                FROM d{it}
            ) WHERE rn = 1
        )""")
        if it < iters:
            ctes.append(f"""s{it + 1} AS (
                SELECT a{it}.cluster, p.pos,
                       ROUND(CAST(SUM(CAST(v.ev[p.pos] AS DECIMAL(20,10))) AS DOUBLE)
                             / COUNT(*), 6) AS comp
                FROM a{it} JOIN v USING (vec_id),
                     (SELECT unnest(range(1, {dim + 1})) AS pos) p
                GROUP BY a{it}.cluster, p.pos
            )""")
            ctes.append(f"""cb{it + 1} AS (
                SELECT cb{it}.cid, COALESCE(m.cv, cb{it}.cv) AS cv
                FROM cb{it} LEFT JOIN (
                    SELECT cluster AS cid, list(comp ORDER BY pos) AS cv
                    FROM s{it + 1} GROUP BY cluster
                ) m ON m.cid = cb{it}.cid
            )""")
    joined = ",\n        ".join(ctes)
    tail = final_select or f"SELECT vec_id, cluster FROM a{iters}"
    return f"""
        WITH {joined}
        {tail}
    """


def _bloom_membership_oracle() -> str:
    """Rebuild the identical md5-derived Bloom bit set in DuckDB and
    probe every customer key against it."""
    from cassandra_data_migration_spark.operators.bloom import bloom_positions_sql

    build = " UNION ALL ".join(
        f"SELECT {p} AS pos FROM orders"
        for p in bloom_positions_sql("o_custkey")
    )
    probes = " AND ".join(
        f"{p} IN (SELECT pos FROM pos)"
        for p in bloom_positions_sql("c_custkey")
    )
    return f"""
        WITH pos AS (SELECT DISTINCT pos FROM ({build}))
        SELECT c_custkey,
               CASE WHEN {probes} THEN 1 ELSE 0 END AS might_contain
        FROM customer
    """


_SHINGLES_CTE = """
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
               ))) AS shingle
        FROM documents
    )
"""

_SIGS_CTE = (
    _SHINGLES_CTE
    + """,
    sigs AS (
        SELECT doc_id,
               MIN(md5(concat('0:', shingle))) AS sig0,
               MIN(md5(concat('1:', shingle))) AS sig1,
               MIN(md5(concat('2:', shingle))) AS sig2,
               MIN(md5(concat('3:', shingle))) AS sig3
        FROM sh GROUP BY doc_id
    )
"""
)


def _stopword_list_sql(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _lang_id_oracle() -> str:
    from cassandra_data_migration_spark.operators.text import LANG_STOPWORDS

    langs = sorted(LANG_STOPWORDS)
    scores = ",\n           ".join(
        f"len(list_filter(string_split(text, ' '), "
        f"t -> list_contains({_stopword_list_sql(LANG_STOPWORDS[lg])}, t))) AS s_{lg}"
        for lg in langs
    )
    best = "GREATEST(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    cases = "\n               ".join(
        f"WHEN s_{lg} = {best} AND {best} > 0 THEN '{lg}'" for lg in langs
    )
    return f"""
        WITH scored AS (
            SELECT doc_id,
           {scores}
            FROM documents
        )
        SELECT doc_id,
               CASE {cases}
               ELSE 'unknown' END AS predicted_lang
        FROM scored
    """


def _simhash_oracle(nibbles: int = 16) -> str:
    sums = ",\n               ".join(
        f"SUM(CASE WHEN substr(h, {i + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE 0 END) AS b{i}"
        for i in range(nibbles)
    )
    bits = " + ".join(
        f"(CASE WHEN b{i} * 2 > n THEN 1 ELSE 0 END) * {2 ** i}" for i in range(nibbles)
    )
    return f"""
        WITH {_SHINGLES_CTE},
        tok AS (
            SELECT doc_id, md5(shingle) AS h FROM sh
        ),
        g AS (
            SELECT doc_id, COUNT(*) AS n,
               {sums}
            FROM tok GROUP BY doc_id
        )
        SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM g
    """


_COS_SIM = (
    "list_dot_product(a_v, b_v) / "
    "(sqrt(list_dot_product(a_v, a_v)) * sqrt(list_dot_product(b_v, b_v)))"
)


def _synthetic_users_oracle() -> str:
    """Regenerates generate_users(count=200, seed=42) entirely in SQL:
    every draw is functions/hashing.md5_draw, which DuckDB recomputes
    bit-identically (seed layout mirrors generate.generate_users)."""
    from cassandra_data_migration_spark.functions.hashing import md5_draw_sql

    def d(seed: int) -> str:
        return md5_draw_sql(seed, "id")

    firsts = "['john','jane','alex','maria','wei','ana','omar','lena']"
    lasts = "['smith','garcia','chen','mueller','silva','khan','ito','novak']"
    statuses = "['active','inactive','suspended']"
    return f"""
        WITH base AS (
            SELECT id,
                   md5(concat_ws(':', '42', CAST(id AS VARCHAR))) AS uh,
                   {firsts}[{d(43)} % 8 + 1] AS first,
                   {lasts}[{d(44)} % 8 + 1] AS last
            FROM range(200) t(id)
        )
        SELECT concat_ws('-', substr(uh,1,8), substr(uh,9,4), substr(uh,13,4),
                         substr(uh,17,4), substr(uh,21,12)) AS user_id,
               first || '.' || last || CAST(id AS VARCHAR) AS username,
               first || '.' || last || CAST(id AS VARCHAR) || '@example.com' AS email,
               upper(substr(first,1,1)) || substr(first,2) AS first_name,
               upper(substr(last,1,1)) || substr(last,2) AS last_name,
               TIMESTAMP '2024-01-01 00:00:00' + to_seconds({d(45)} % 31536000) AS created_at,
               {statuses}[{d(46)} % 3 + 1] AS status,
               printf('%d Main St, City %d', {d(47)} % 9999, {d(48)} % 100) AS address,
               printf('+1-555-%07d', {d(49)} % 10000000) AS phone,
               '{{"theme":"' || ['dark','light'][{d(50)} % 2 + 1] ||
               '","notifications":"' || ['on','off'][{d(51)} % 2 + 1] ||
               '","language":"' || ['en','es','fr'][{d(52)} % 3 + 1] || '"}}' AS prefs_json
        FROM base
    """


def _traffic_ops_mix_oracle() -> str:
    from cassandra_data_migration_spark.functions.hashing import md5_draw_sql

    return f"""
        WITH d AS (
            SELECT {md5_draw_sql(42, "event_id")} AS draw FROM events
        ),
        f AS (SELECT (draw % 100) < 75 AS is_read FROM d)
        SELECT COUNT(*) AS total_ops,
               CAST(SUM(CASE WHEN is_read THEN 1 ELSE 0 END) AS BIGINT) AS reads,
               CAST(SUM(CASE WHEN NOT is_read THEN 1 ELSE 0 END) AS BIGINT) AS writes,
               ROUND(100.0 * SUM(CASE WHEN is_read THEN 1 ELSE 0 END)::DOUBLE
                     / COUNT(*), 2) AS read_pct
        FROM f
    """




register_queries(globals())
__all__ = export_all(globals())
