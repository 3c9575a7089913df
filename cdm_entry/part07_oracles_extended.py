"""Extended oracle registrations and the query/oracle pairs added with them (text, graph, lakehouse, sketches).

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry.part06b_oracles_main2 import *  # noqa: F401,F403

ORACLES["gram_matrix"] = _gram_matrix_sql("embeddings", "embedding", "vec_id", 64)

from cassandra_data_migration_spark.operators.ring import (  # noqa: E402
    ring_sql as _ring_sql,
)

ORACLES["ring_ownership"] = _ring_sql("orders", "o_orderkey")

from cassandra_data_migration_spark.operators.ring import (  # noqa: E402
    replica_sql as _replica_sql,
)

ORACLES["replica_ownership"] = _replica_sql("orders", "o_orderkey", rf=3)

ORACLES["shipping_priority"] = """
    SELECT o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,2)))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
"""

ORACLES["region_volume"] = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,2)))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
"""

ORACLES["event_anomalies"] = """
    WITH s AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS sv,
               CAST(SUM(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE) AS sq
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - sv / n)
                 / sqrt(sq / n - (sv / n) * (sv / n)), 4) AS z
    FROM events e JOIN s USING (event_type)
    WHERE ABS(ROUND((e.value - sv / n)
                    / sqrt(sq / n - (sv / n) * (sv / n)), 4)) > 2.5
"""

ORACLES["trending_types"] = """
    WITH c AS (
        SELECT date_trunc('hour', ts) AS win_start, event_type,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT win_start, event_type, n_events,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY win_start
                   ORDER BY n_events DESC, event_type
               ) AS INT) AS rnk
        FROM c
    )
    SELECT win_start, event_type, n_events, rnk FROM r WHERE rnk <= 3
"""

ORACLES["inverted_postings"] = """
    WITH tf AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY term, doc_id
    ),
    r AS (
        SELECT term, doc_id, tf,
               ROW_NUMBER() OVER (
                   PARTITION BY term ORDER BY tf DESC, doc_id
               ) AS rnk
        FROM tf
    )
    SELECT term, COUNT(*) AS doc_freq,
           array_to_string(
               list(CAST(doc_id AS VARCHAR) ORDER BY rnk)
                   FILTER (WHERE rnk <= 5),
               ' ') AS postings
    FROM r GROUP BY term
"""

ORACLES["retry_collapse"] = """
    WITH g AS (
        SELECT event_id, user_id, event_type, ts,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id
               ) AS gap
        FROM events
    ),
    s AS (
        SELECT *, SUM(CASE WHEN gap IS NULL OR gap > 60000000
                           THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sess
        FROM g
    ),
    f AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type, sess
                   ORDER BY ts, event_id) AS r
        FROM s
    )
    SELECT event_id, user_id, event_type, ts FROM f WHERE r = 1
"""

ORACLES["value_histogram"] = """
    WITH b AS (
        SELECT LEAST(GREATEST(CAST(floor((value - 0.0) / 10.0) AS BIGINT),
                              0), 19) AS bucket
        FROM events
    )
    SELECT bucket, ROUND(0.0 + bucket * 10.0, 4) AS lo_edge,
           COUNT(*) AS n
    FROM b GROUP BY bucket
"""

ORACLES["dq_report"] = """
    WITH raw AS (
        SELECT 'not_null(o_custkey)' AS check_name,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
               COUNT(*) AS n_rows
        FROM orders
        UNION ALL
        SELECT 'range(o_totalprice)',
               CAST(SUM(CASE WHEN o_totalprice IS NULL
                              OR o_totalprice < 0.0
                              OR o_totalprice > 1000000.0 THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM orders
        UNION ALL
        SELECT 'in_set(o_orderstatus)',
               CAST(SUM(CASE WHEN o_orderstatus IS NULL
                              OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM orders
        UNION ALL
        SELECT 'regex(o_orderpriority)',
               CAST(SUM(CASE WHEN o_orderpriority IS NULL
                              OR NOT regexp_matches(o_orderpriority, '^[0-9]-') THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM orders
        UNION ALL
        SELECT 'expect(finished_have_price)',
               CAST(SUM(CASE WHEN NOT COALESCE(
                        o_orderstatus != 'F' OR o_totalprice > 0,
                        FALSE) THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM orders
        UNION ALL
        SELECT 'unique(o_orderkey)',
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
               COUNT(*)
        FROM orders
        UNION ALL
        SELECT 'fk(o_custkey)',
               CAST((SELECT COUNT(*) FROM orders o
                     LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                       ON o.o_custkey = c.c_custkey
                     WHERE c.c_custkey IS NULL) AS BIGINT),
               COUNT(*)
        FROM orders
    )
    SELECT check_name, violations, n_rows, violations = 0 AS passed FROM raw
"""

from cassandra_data_migration_spark.operators.layout import (  # noqa: E402
    zorder_key_sql as _zorder_key_sql,
)

ORACLES["zorder_keys"] = f"""
    SELECT event_id, x, y,
           {_zorder_key_sql(['x', 'y'], bits=8)} AS zkey
    FROM (
        SELECT event_id,
               abs(user_id) % 256 AS x,
               CAST(abs(floor(value)) AS BIGINT) % 256 AS y
        FROM events
    )
"""


from cassandra_data_migration_spark.operators.merkle import (  # noqa: E402
    merkle_digest_sql as _merkle_digest_sql,
)

# column encodings mirror merkle.portable_digest_cols for the orders
# schema: ints/strings cast, DOUBLE via FLOOR(x*100), TIMESTAMP via
# explicit strftime (bare casts disagree on fractional seconds)
_ORDERS_DIGEST_EXPRS = [
    "CAST(o_orderkey AS VARCHAR)",
    "CAST(o_custkey AS VARCHAR)",
    "CAST(o_orderstatus AS VARCHAR)",
    "CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS VARCHAR)",
    "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f')",
    "CAST(o_orderpriority AS VARCHAR)",
]

ORACLES["merkle_range_diff"] = f"""
    WITH o AS ({_merkle_digest_sql("SELECT * FROM orders", "o_orderkey", _ORDERS_DIGEST_EXPRS)}),
    t AS ({_merkle_digest_sql(_TARGET_SQL, "o_orderkey", _ORDERS_DIGEST_EXPRS)})
    SELECT * FROM (
        SELECT COALESCE(o.bucket, t.bucket) AS bucket,
               o.n_rows AS origin_rows, t.n_rows AS target_rows,
               o.digest AS origin_digest, t.digest AS target_digest,
               CASE WHEN t.n_rows IS NULL THEN 'missing_range'
                    WHEN o.n_rows IS NULL THEN 'extra_range'
                    WHEN o.n_rows <> t.n_rows OR o.digest <> t.digest
                         THEN 'mismatch'
                    ELSE 'match' END AS status
        FROM o FULL OUTER JOIN t ON o.bucket = t.bucket
    ) WHERE status <> 'match'
"""

# the prefix filter is lossless, so its oracle IS the full quadratic
# Jaccard recompute — identical output to dedup_ngram_jaccard
ORACLES["prefix_filter_pairs"] = ORACLES["dedup_ngram_jaccard"]

_EVENTS_DIGEST_EXPRS = [
    "CAST(event_id AS VARCHAR)",
    "strftime(ts, '%Y-%m-%d %H:%M:%S.%f')",
    "CAST(user_id AS VARCHAR)",
    "CAST(event_type AS VARCHAR)",
    "CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR)",
    "CAST(props AS VARCHAR)",
]

def _media_decode_expected() -> str:
    # expected sums computed straight from the pixel generator —
    # independent of the BMP encode/decode roundtrip under test
    vals = []
    for i in range(32):
        rgb = _synth_rgb(i)
        vals.append(
            f"({i}, 4, 4, {sum(rgb[0::3])}, {sum(rgb[1::3])}, {sum(rgb[2::3])})"
        )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(vals)
        + ") AS t(doc_id, width, height, sum_r, sum_g, sum_b)"
    )


ORACLES["id_gap_islands"] = """
    WITH present AS (
        SELECT DISTINCT event_id FROM events WHERE event_id % 97 <> 0
    ),
    keyed AS (
        SELECT event_id,
               event_id - ROW_NUMBER() OVER (ORDER BY event_id) AS island
        FROM present
    )
    SELECT MIN(event_id) AS island_start,
           MAX(event_id) AS island_end,
           COUNT(*) AS island_len
    FROM keyed GROUP BY island
"""

ORACLES["winsorized_stats"] = """
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY 1
    )
    SELECT e.event_type,
           ROUND(CAST(SUM(CAST(LEAST(GREATEST(e.value, b.lo), b.hi)
                 AS DECIMAL(20,6))) / COUNT(*) AS DOUBLE), 6)
               AS winsorized_mean,
           ROUND(ANY_VALUE(b.lo), 6) AS lower_bound,
           ROUND(ANY_VALUE(b.hi), 6) AS upper_bound,
           COUNT(*) AS n
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    GROUP BY 1
"""

ORACLES["code_signals"] = r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[{}\[\]();]')) AS n_braces,
           len(regexp_extract_all(text, '(==|!=|->|=>|&&|\|\||::)'))
               AS n_operators,
           len(regexp_extract_all(text,
               '\b([a-z]+[A-Z][A-Za-z]*|[a-z]+_[a-z_]+)\b'))
               AS n_identifiers,
           ROUND((len(regexp_extract_all(text, '[{}\[\]();]'))
                  + len(regexp_extract_all(text, '(==|!=|->|=>|&&|\|\||::)'))
                  + len(regexp_extract_all(text,
                      '\b([a-z]+[A-Z][A-Za-z]*|[a-z]+_[a-z_]+)\b')))
                 * 1.0 / GREATEST(len(regexp_extract_all(text, '\S+')), 1),
                 6) AS code_density,
           (len(regexp_extract_all(text, '[{}\[\]();]'))
            + len(regexp_extract_all(text, '(==|!=|->|=>|&&|\|\||::)'))
            + len(regexp_extract_all(text,
                '\b([a-z]+[A-Z][A-Za-z]*|[a-z]+_[a-z_]+)\b')))
           * 1.0 / GREATEST(len(regexp_extract_all(text, '\S+')), 1)
           > 0.05 AS is_codelike
    FROM documents
"""

ORACLES["benford_profile"] = f"""
    WITH f AS (SELECT o_totalprice FROM orders WHERE ABS(o_totalprice) >= 1),
    counts AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(ABS(o_totalprice)) AS BIGINT)
                   AS VARCHAR), 1, 1) AS INT) AS digit,
               COUNT(*) AS n
        FROM f GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS t FROM f),
    benford(digit, benford_pct) AS (
        VALUES {", ".join(f"({k}, {round(__import__('math').log10(1 + 1/k), 6)})" for k in range(1, 10))}
    )
    SELECT c.digit, c.n,
           ROUND(c.n * 1.0 / tot.t, 6) AS observed_pct,
           b.benford_pct,
           ROUND(ABS(ROUND(c.n * 1.0 / tot.t, 6) - b.benford_pct), 6)
               AS abs_dev
    FROM counts c JOIN benford b ON b.digit = c.digit CROSS JOIN tot
    WHERE c.digit BETWEEN 1 AND 9
"""

ORACLES["readability"] = """
    WITH c AS (
        SELECT doc_id,
               GREATEST(len(regexp_extract_all(lower(text),
                   '[a-z0-9'']+')), 1) AS n_words,
               GREATEST(len(regexp_extract_all(lower(text),
                   '[.!?]+')), 1) AS n_sentences,
               GREATEST(len(regexp_extract_all(lower(text),
                   '[aeiouy]+')), 1) AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           ROUND(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                 - 84.6 * (n_syllables * 1.0 / n_words), 4) AS flesch_score
    FROM c
"""

ORACLES["merge_intervals"] = """
    WITH iv AS (
        SELECT user_id, ts AS start_ts, ts + INTERVAL 30 MINUTE AS end_ts
        FROM events
    ),
    flagged AS (
        SELECT *,
               CASE WHEN start_ts > MAX(end_ts) OVER (
                        PARTITION BY user_id ORDER BY start_ts, end_ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    OR MAX(end_ts) OVER (
                        PARTITION BY user_id ORDER BY start_ts, end_ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
               THEN 1 ELSE 0 END AS new_span
        FROM iv
    ),
    spanned AS (
        SELECT *, SUM(new_span) OVER (
                   PARTITION BY user_id ORDER BY start_ts, end_ts
                   ROWS UNBOUNDED PRECEDING) AS span
        FROM flagged
    )
    SELECT user_id, MIN(start_ts) AS span_start, MAX(end_ts) AS span_end,
           COUNT(*) AS n_merged
    FROM spanned GROUP BY user_id, span
"""

ORACLES["ab_test_readout"] = """
    WITH assigned AS (
        SELECT CASE WHEN CAST(CAST('0x' || substr(md5('exp1'
                   || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
                   % 10000 AS INTEGER) < 5000
               THEN 'treatment' ELSE 'control' END AS arm,
               CAST(value AS DECIMAL(18,6)) AS x
        FROM events
    ),
    stats AS (
        SELECT arm, COUNT(*) AS n, SUM(x) AS sx,
               SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
        FROM assigned GROUP BY 1
    ),
    per AS (
        SELECT arm, n,
               CAST(sx AS DOUBLE) / n AS mean,
               (CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
               / (n - 1) AS variance
        FROM stats
    )
    SELECT t.n AS n_treatment, c.n AS n_control,
           ROUND(t.mean, 6) AS mean_treatment,
           ROUND(c.mean, 6) AS mean_control,
           ROUND(t.mean - c.mean, 6) AS lift,
           ROUND((t.mean - c.mean)
                 / sqrt(t.variance / t.n + c.variance / c.n), 6) AS welch_z
    FROM (SELECT * FROM per WHERE arm = 'treatment') t,
         (SELECT * FROM per WHERE arm = 'control') c
"""

ORACLES["multi_touch_credit"] = """
    WITH pairs AS (
        SELECT p.event_id AS purchase_id, p.value, c.event_id AS click_id
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 4 HOUR
    ),
    touches AS (
        SELECT purchase_id, COUNT(*) AS n, ANY_VALUE(value) AS v
        FROM pairs GROUP BY 1
    )
    SELECT pr.click_id, COUNT(*) AS n_purchases,
           CAST(SUM(CAST(FLOOR(t.v * 100 / t.n) AS BIGINT))
                AS BIGINT) AS credit_cents
    FROM pairs pr JOIN touches t ON pr.purchase_id = t.purchase_id
    GROUP BY 1
"""

ORACLES["cumulative_users"] = """
    WITH first AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS period
        FROM events GROUP BY 1
    ),
    per AS (SELECT period, COUNT(*) AS new_users FROM first GROUP BY 1)
    SELECT period, new_users,
           CAST(SUM(new_users) OVER (ORDER BY period
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM per
"""

ORACLES["growth_accounting"] = """
    WITH active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS period
        FROM events
    ),
    flagged AS (
        SELECT user_id, period,
               LAG(period) OVER (PARTITION BY user_id ORDER BY period)
                   AS prev,
               LEAD(period) OVER (PARTITION BY user_id ORDER BY period)
                   AS next
        FROM active
    )
    SELECT period,
           CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN prev IS NOT NULL
                AND date_diff('second', prev, period) = 604800
                THEN 1 ELSE 0 END) AS BIGINT) AS retained,
           CAST(SUM(CASE WHEN prev IS NOT NULL
                AND date_diff('second', prev, period) > 604800
                THEN 1 ELSE 0 END) AS BIGINT) AS resurrected,
           CAST(SUM(CASE WHEN next IS NULL
                OR date_diff('second', period, next) > 604800
                THEN 1 ELSE 0 END) AS BIGINT) AS churned_after
    FROM flagged GROUP BY 1
"""

ORACLES["null_safe_join"] = """
    WITH ev AS (
        SELECT event_id,
               CASE WHEN value < 5 THEN NULL ELSE event_type END AS etype
        FROM events
    ),
    dim AS (
        SELECT DISTINCT etype AS dim_key,
               COALESCE('type:' || etype, 'unattributed') AS label
        FROM ev
    )
    SELECT d.label, COUNT(*) AS n_events
    FROM ev e LEFT JOIN dim d ON e.etype IS NOT DISTINCT FROM d.dim_key
    GROUP BY d.label
"""

# independent footer reader: DuckDB's parquet_metadata().  Computed at
# oracle_sql() time from the contract sf dir (CDM_ORACLE_SF_DIR, driver
# default sf0.01) so the contract holds at any scale factor; grouping
# includes the file so multi-file datasets don't merge row groups.


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _html_extract_oracle() -> str:
    from cassandra_data_migration_spark.operators.text import html_strip_sql

    a, b, c = _HTML_WRAP_PARTS
    expr = (
        f"{_sql_quote(a)} || source || {_sql_quote(b)} || text || "
        f"{_sql_quote(c)}"
    )
    return (
        f"SELECT doc_id, {html_strip_sql(expr)} AS extracted FROM documents"
    )


def _warc_ingest_oracle() -> str:
    from cassandra_data_migration_spark.operators.text import html_strip_sql

    expr = (
        "'<html><body><h1>' || source || '</h1><p>' || text || "
        "'</p></body></html>'"
    )
    return f"""
        SELECT 'http://example.org/' || source || '/' || doc_id
                   AS target_uri,
               'response' AS warc_type,
               200 AS http_status,
               'text/html; charset=utf-8' AS http_content_type,
               {html_strip_sql(expr)} AS text
        FROM documents WHERE doc_id < 64
    """


def _rowgroup_stats_oracle() -> str:
    sf_dir = os.environ.get("CDM_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    return f"""
        SELECT regexp_extract(file_name, '[^/]+$') AS file,
               CAST(row_group_id
                    - MIN(row_group_id) OVER (PARTITION BY file_name)
                    AS INT) AS row_group,
               num_rows,
               n_columns
        FROM (
            SELECT file_name, row_group_id,
                   ANY_VALUE(row_group_num_rows) AS num_rows,
                   CAST(COUNT(*) AS INT) AS n_columns
            FROM parquet_metadata('{sf_dir}/lineitem.parquet')
            GROUP BY file_name, row_group_id
        )
    """

ORACLES["stream_cdc_state"] = """
    WITH log AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id AS seq,
               CASE WHEN event_type = 'error' THEN 'D'
                    WHEN event_type = 'signup' THEN 'I'
                    ELSE 'U' END AS op,
               value
        FROM events
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts_us DESC, seq DESC) AS rn
        FROM log
    )
    SELECT user_id, ts_us, seq, op, value
    FROM ranked WHERE rn = 1 AND op <> 'D'
"""

# decrypt(encrypt(x)) == x exactly, so the oracle is the identity
ORACLES["column_encryption"] = """
    SELECT event_id, props AS props_roundtrip FROM events
"""

ORACLES["dp_group_counts"] = """
    WITH g AS (
        SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1
    ),
    noised AS (
        SELECT event_type, n,
               (CAST('0x' || substr(md5(concat_ws(':', 'dp-release',
                    CAST(event_type AS VARCHAR))), 1, 8) AS BIGINT) + 1)
                   / 4294967297.0 AS u
        FROM g
    )
    SELECT event_type,
           ROUND(GREATEST(n + (-2.0 * sign(u - 0.5)
               * ln(1.0 - 2.0 * abs(u - 0.5))), 0.0), 6) AS noisy_count
    FROM noised
"""

ORACLES["k_anonymity"] = """
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb,
           COUNT(*) AS group_size
    FROM customer GROUP BY 1, 2, 3 HAVING COUNT(*) < 10
"""

ORACLES["sql_passthrough"] = """
    SELECT n.n_name AS nation,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
"""

ORACLES["props_variant"] = """
    SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k_value
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) % 7 = 0
"""

ORACLES["multiset_compare"] = f"""
    WITH t2 AS (
        SELECT * FROM ({_TARGET_SQL})
        UNION ALL
        SELECT * FROM ({_TARGET_SQL}) WHERE o_orderkey % 13 = 0
    ),
    oa AS (SELECT COUNT(*) AS n FROM
           (SELECT * FROM orders EXCEPT ALL SELECT * FROM t2)),
    ib AS (SELECT COUNT(*) AS n FROM
           (SELECT * FROM orders INTERSECT ALL SELECT * FROM t2)),
    ob AS (SELECT COUNT(*) AS n FROM
           (SELECT * FROM t2 EXCEPT ALL SELECT * FROM orders))
    SELECT oa.n AS only_origin, ib.n AS in_both, ob.n AS only_target
    FROM oa, ib, ob
"""

ORACLES["media_decode"] = _media_decode_expected()

ORACLES["cdc_apply"] = """
    WITH log AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type = 'error' THEN 'D'
                    WHEN event_type = 'signup' THEN 'I'
                    ELSE 'U' END AS op
        FROM events
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM log
    )
    SELECT user_id, ts, event_id, value, op
    FROM ranked WHERE rn = 1 AND op <> 'D'
"""

ORACLES["priority_line_counts"] = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
    GROUP BY 1
"""

ORACLES["promo_revenue"] = """
    WITH agg AS (
        SELECT SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))
                   ELSE CAST(0 AS DECIMAL(28,4)) END) AS promo,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   AS DECIMAL(28,4))) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
    )
    SELECT CAST(promo AS DOUBLE) AS promo_revenue,
           CAST(total AS DOUBLE) AS total_revenue,
           ROUND(100.0 * (CAST(promo AS DOUBLE) / CAST(total AS DOUBLE)), 4)
               AS promo_pct
    FROM agg
"""

ORACLES["disjunctive_revenue"] = """
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand IN ('Brand#1', 'Brand#2') AND p_size <= 20
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand IN ('Brand#3', 'Brand#4') AND p_size <= 30
           AND l_quantity BETWEEN 10 AND 30)
"""

ORACLES["pmi_collocations"] = r"""
    WITH toks AS (
        SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS ts
        FROM documents
    ),
    bi AS (
        SELECT p.a, p.b, COUNT(*) AS n_ab FROM (
            SELECT unnest(list_transform(range(1, len(ts)),
                i -> struct_pack(a := ts[CAST(i AS INT)],
                                 b := ts[CAST(i AS INT) + 1]))) AS p
            FROM toks WHERE len(ts) >= 2
        ) GROUP BY 1, 2 HAVING COUNT(*) >= 5
    ),
    uni AS (
        SELECT t, COUNT(*) AS n FROM (
            SELECT unnest(ts) AS t FROM toks
        ) WHERE t <> '' GROUP BY 1
    ),
    nt AS (SELECT SUM(n) AS total FROM uni)
    SELECT bi.a, bi.b, bi.n_ab,
           ROUND(ln((CAST(n_ab AS DOUBLE) * CAST(nt.total AS DOUBLE))
                 / (CAST(ua.n AS DOUBLE) * CAST(ub.n AS DOUBLE))), 6) AS pmi
    FROM bi
    JOIN uni ua ON ua.t = bi.a
    JOIN uni ub ON ub.t = bi.b
    CROSS JOIN nt
    ORDER BY pmi DESC, bi.a ASC, bi.b ASC
    LIMIT 50
"""

ORACLES["ohlc_bars"] = """
    WITH t AS (
        SELECT date_trunc('day', ts) AS bar_start, event_type, ts, value
        FROM events
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY bar_start, event_type
                                  ORDER BY ts ASC, value ASC) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY bar_start, event_type
                                  ORDER BY ts DESC, value DESC) AS rn_d
        FROM t
    )
    SELECT bar_start, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_ticks
    FROM r GROUP BY 1, 2
"""

ORACLES["retention_cohorts"] = """
    WITH p AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS period
        FROM events
    ),
    f AS (SELECT user_id, MIN(period) AS cohort FROM p GROUP BY 1)
    SELECT f.cohort,
           CAST(FLOOR(date_diff('day', f.cohort, p.period) / 7.0) AS INT)
               AS period_offset,
           COUNT(*) AS n_users
    FROM p JOIN f ON p.user_id = f.user_id
    GROUP BY 1, 2
"""

ORACLES["knn_join"] = f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS a_v
        FROM embeddings WHERE vec_id < 20
    ),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROUND({_COS_SIM.replace('b_v', 'c.embedding::DOUBLE[]')}, 4)
                   AS cos_sim
        FROM embeddings c, q
        WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id ASC)
                   AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
"""

ORACLES["hard_negatives"] = f"""
    WITH q AS (
        SELECT vec_id AS query_id, label AS ql,
               embedding::DOUBLE[] AS a_v
        FROM embeddings WHERE vec_id < 20
    ),
    scored AS (
        SELECT q.query_id, c.vec_id AS negative_id,
               c.label AS negative_label,
               ROUND({_COS_SIM.replace('b_v', 'c.embedding::DOUBLE[]')}, 4)
                   AS cos_sim
        FROM embeddings c, q
        WHERE c.vec_id <> q.query_id AND c.label <> q.ql
    ),
    ranked AS (
        SELECT query_id, negative_id, negative_label, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, negative_id ASC)
                   AS rank
        FROM scored
    )
    SELECT query_id, negative_id, negative_label, cos_sim,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
"""


def _stream_quantiles_oracle(percentiles=(0.5, 0.95, 0.99)) -> str:
    """Exact interpolated quantiles over integer cents, micro-cent
    output — the precise floor(lo*1e6 + t*(hi-lo)*1e6 + 0.5)
    expression streaming/quantiles.quantile_ucents computes, so both
    engines run identical IEEE ops in identical order.  Column names
    come from streaming/quantiles.percentile_col so the two schemas
    cannot drift."""
    from cassandra_data_migration_spark.streaming.quantiles import percentile_col

    def pexpr(p: float) -> str:
        pos = f"{p} * (n - 1)"
        idx = f"CAST(floor({pos}) AS INT)"
        t = f"({pos} - floor({pos}))"
        lo = f"l[{idx} + 1]"
        hi = f"l[least({idx} + 2, CAST(n AS INT))]"
        return (
            f"CAST(floor({lo} * 1000000 + {t} * ({hi} - {lo}) * 1000000"
            f" + 0.5) AS BIGINT) AS {percentile_col(p)}"
        )

    cols = ",\n           ".join(pexpr(p) for p in percentiles)
    return f"""
    WITH e AS (
        SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS window_h,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events
    ),
    g AS (
        SELECT window_h, list_sort(list(c)) AS l,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM e GROUP BY 1
    )
    SELECT window_h, n AS n_events,
           {cols}
    FROM g
"""


ORACLES["stream_quantiles"] = _stream_quantiles_oracle()

ORACLES["customer_order_distribution"] = """
    WITH per_cust AS (
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
"""

# Misra-Gries audit: the truth side (exact counts over the bound) is
# recomputed in SQL; covered/bound_ok are guarantees of the sketch,
# so the oracle pins them to TRUE.
ORACLES["mg_heavy_hitters"] = """
    WITH t AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM t),
    exact AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS true_cnt
        FROM t GROUP BY 1
    )
    SELECT term, true_cnt, TRUE AS covered, TRUE AS bound_ok
    FROM exact, n WHERE true_cnt > total // 257
"""

# Compaction audit: 40 non-empty round-robin partitions -> 40 files
# before; total bytes << 128 MB -> exactly 1 after; row count and key
# checksum prove losslessness.
ORACLES["compaction_audit"] = """
    SELECT CAST(40 AS BIGINT) AS files_before,
           CAST(1 AS BIGINT) AS files_after,
           CAST(COUNT(*) AS BIGINT) AS rows,
           TRUE AS rows_match,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer
"""

# Triangle counting: same synthesized domain graph as the pagerank
# oracle; the oracle counts triangles with the plain canonical
# a<b<c triple join (the engine's degree-oriented wedge plan must
# produce identical counts).
ORACLES["domain_triangles"] = f"""
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
    und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges),
    deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
        GROUP BY 1
    ),
    tris AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pv AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS t
        FROM (SELECT x AS v FROM tris UNION ALL
              SELECT y FROM tris UNION ALL
              SELECT z FROM tris)
        GROUP BY 1
    )
    SELECT idx.domain, deg.d AS degree,
           CAST(COALESCE(pv.t, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN deg.d >= 2
                THEN (2 * COALESCE(pv.t, 0) * 1000000)
                     // (deg.d * (deg.d - 1))
                ELSE 0 END AS BIGINT) AS clustering_e6
    FROM idx
    JOIN deg ON deg.v = idx.i
    LEFT JOIN pv ON pv.v = idx.i
"""

# Incremental MV refresh must equal the full recompute of the final
# state: survived base rows (with the update applied) plus inserts.
ORACLES["mv_incremental_refresh"] = """
    WITH final AS (
        SELECT o_custkey,
               CASE WHEN o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0
                         AND o_orderkey % 7 = 0
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) + 10
                    ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS v
        FROM orders
        WHERE o_orderkey % 3 = 0
           OR (o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0)
    )
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(v) AS DOUBLE) AS sum_val
    FROM final GROUP BY o_custkey
"""

# The streaming twin replays the identical changelog, so it shares
# the recompute oracle.
ORACLES["stream_mv_refresh"] = ORACLES["mv_incremental_refresh"]

# Streaming sessionization: batch lag->flag->running-sum recompute
# over second-truncated timestamps (the streaming op's session_window
# merges iff idle <= gap, identical to the strictly-greater new-
# session rule here).
ORACLES["stream_sessions"] = """
    WITH e AS (
        SELECT user_id, event_id, date_trunc('second', ts) AS sec_ts,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events
    ),
    f AS (
        SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                         OR sec - lag(sec) OVER w > 28800
                       THEN 1 ELSE 0 END AS is_new
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    s AS (
        SELECT *, SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY sec, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
        FROM f
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(sec_ts) AS session_start, MAX(sec_ts) AS session_end,
           CAST(MAX(sec) - MIN(sec) AS BIGINT) AS duration_s
    FROM s GROUP BY user_id, session_id
"""

# Video frame stats: the .y4m payloads are generated from pure
# integer arithmetic, so the oracle recomputes the sampled luma sums
# directly from the same formula (the engine must produce identical
# numbers THROUGH the real container encode/parse roundtrip).
ORACLES["video_frame_stats"] = """
    WITH vids AS (SELECT CAST(i AS BIGINT) AS i FROM range(32) t(i)),
    fr AS (
        SELECT i, unnest(range(0, 3 + CAST(i % 3 AS INT))) AS f FROM vids
    )
    SELECT i AS doc_id, CAST(f AS INT) AS frame_index,
           CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           CAST(list_sum(list_transform(range(0, 16),
                p -> (i * 31 + f * 7 + p) % 256)) AS BIGINT) AS y_sum
    FROM fr WHERE f % 2 = 0
"""

# Audio tone detection: integer-cycle tones peak exactly at their
# bin (DFT orthogonality), so the oracle is pure arithmetic + TRUE.
ORACLES["audio_tone_detect"] = """
    SELECT CAST(i AS BIGINT) AS doc_id,
           CAST(64 AS BIGINT) AS n_samples,
           CAST(1 + i % 8 AS INT) AS dominant_bin,
           CAST(1 + i % 8 AS INT) AS expected_bin,
           TRUE AS match
    FROM range(32) t(i)
"""

def _cms_oracle(depth: int = 3, width: int = 4096, floor_ppm: int = 1000) -> str:
    from cassandra_data_migration_spark.functions.hashing import md5_draw_sql

    buck = "\n        UNION ALL ".join(
        f"SELECT term, {r} AS r, "
        f"{md5_draw_sql(f'cms{r}', 'term')} % {width} AS bucket FROM toks"
        for r in range(depth)
    )
    return f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
    exact AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS true_cnt
        FROM toks GROUP BY 1
    ),
    buck AS (
        {buck}
    ),
    cms AS (
        SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM buck GROUP BY 1, 2
    ),
    probes AS (
        SELECT e.term, e.true_cnt FROM exact e, tot
        WHERE e.true_cnt * 1000000 > {floor_ppm} * tot.n
    ),
    keyed AS (
        SELECT DISTINCT p.term, p.true_cnt, b.r, b.bucket
        FROM probes p JOIN buck b USING (term)
    )
    SELECT term, true_cnt, CAST(MIN(cnt) AS BIGINT) AS est_cnt,
           CAST(MIN(cnt) AS BIGINT) >= true_cnt AS over_ok
    FROM keyed JOIN cms USING (r, bucket)
    GROUP BY term, true_cnt
    """


ORACLES["cms_token_counts"] = _cms_oracle()


def _mmr_oracle() -> str:
    from cassandra_data_migration_spark.operators.similarity import (
        mmr_select_sql,
    )

    return mmr_select_sql(k=8)


ORACLES["mmr_diverse_select"] = _mmr_oracle()


def _stream_cms_oracle(depth: int = 3, width: int = 4096) -> str:
    from cassandra_data_migration_spark.functions.hashing import md5_draw_sql

    buck = "\n        UNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS r, "
        f"{md5_draw_sql(f'cms{r}', 'term')} % {width} AS bucket FROM toks"
        for r in range(depth)
    )
    return f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    buck AS (
        {buck}
    )
    SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM buck GROUP BY 1, 2
    """


# stream-equals-batch: the streamed sketch state must equal the batch
# sketch cell for cell, so the batch SQL twin checks the stream sink
ORACLES["stream_cms"] = _stream_cms_oracle()


register_queries(globals())
__all__ = export_all(globals())
