"""Extended oracle registrations and the query/oracle pairs added with them (text, graph, lakehouse, sketches).

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry.part06_oracles_main import *  # noqa: F401,F403

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

# T6 pacing: 6 files at maxFilesPerTrigger=1 is exactly 6 batches,
# and the slicing must conserve the row count
ORACLES["throttled_stream_pacing"] = """
    SELECT CAST(6 AS BIGINT) AS n_files,
           CAST(6 AS BIGINT) AS n_batches,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
"""


ORACLES["xml_roundtrip"] = "SELECT * FROM supplier"

ORACLES["fixed_width_roundtrip"] = """
    SELECT s_suppkey, s_name, s_nationkey,
           CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
"""


# HLL rank of the 60-bit window (md5 hex chars 1-15): leading-zero
# run in hex × 4, plus the first significant nibble's internal zeros
_HLL_RANK_SQL = """
        CASE WHEN ltrim(substr(h, 1, 15), '0') = '' THEN 61
             ELSE (15 - length(ltrim(substr(h, 1, 15), '0'))) * 4
                + CASE WHEN substr(ltrim(substr(h, 1, 15), '0'), 1, 1) = '1'
                       THEN 3
                       WHEN substr(ltrim(substr(h, 1, 15), '0'), 1, 1)
                            IN ('2', '3') THEN 2
                       WHEN substr(ltrim(substr(h, 1, 15), '0'), 1, 1)
                            IN ('4', '5', '6', '7') THEN 1
                       ELSE 0 END + 1
        END"""


def _hll_regs_sql(m: int, seed: str) -> str:
    """Shared CTE chain vals→regs: DuckDB twin of
    ``operators/aggregates.hll_registers`` over (grp, v) pairs."""
    return f"""
    WITH vals AS (
        SELECT DISTINCT o_orderpriority AS grp,
               CAST(o_custkey AS VARCHAR) AS v
        FROM orders
    ),
    hashed AS (
        SELECT grp, md5(concat_ws(':', '{seed}', v)) AS h FROM vals
    ),
    cells AS (
        SELECT grp,
               CAST('0x' || substr(h, 16, 8) AS BIGINT) % {m} AS j,
               {_HLL_RANK_SQL} AS p
        FROM hashed
    ),
    regs AS (SELECT grp, j, MAX(p) AS m_rank FROM cells GROUP BY 1, 2)"""


def _hll_oracle(b: int = 8, seed: str = "hll") -> str:
    from cassandra_data_migration_spark.operators.aggregates import (
        hll_constants,
    )

    m, _alpha, c_num = hll_constants(b)
    bound = round(3 * 1.04 / (m**0.5) * 1000)
    return f"""
    {_hll_regs_sql(m, seed)},
    summed AS (
        SELECT grp,
               SUM(CAST(POWER(2, 61 - m_rank) AS HUGEINT)) AS s_present,
               CAST(COUNT(*) AS BIGINT) AS n_present
        FROM regs GROUP BY 1
    ),
    folded AS (
        SELECT grp, n_present,
               {c_num!r} / CAST(s_present
                   + CAST(POWER(2, 61) AS HUGEINT) * ({m} - n_present)
                   AS DOUBLE) AS est_raw
        FROM summed
    ),
    corrected AS (
        SELECT grp, est_raw,
               ({m} - n_present) > 0 AND est_raw <= {2.5 * m!r}
                   AS used_linear_counting,
               CASE WHEN ({m} - n_present) > 0 AND est_raw <= {2.5 * m!r}
                    THEN {float(m)!r}
                         * ln({float(m)!r} / CAST({m} - n_present AS DOUBLE))
                    ELSE est_raw END AS est
        FROM folded
    ),
    exact AS (
        SELECT o_orderpriority AS grp,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS true_distinct
        FROM orders GROUP BY 1
    )
    SELECT e.grp AS o_orderpriority,
           e.true_distinct,
           CAST(FLOOR(est + 0.5) AS BIGINT) AS est_distinct,
           c.used_linear_counting,
           ABS(CAST(FLOOR(est + 0.5) AS BIGINT) - e.true_distinct) * 1000
               <= {bound} * e.true_distinct AS within_3sigma
    FROM exact e JOIN corrected c ON e.grp = c.grp
    """


ORACLES["hll_distinct"] = _hll_oracle()

def _kmv_oracle(k: int = 256, seed: str = "kmv") -> str:
    est_num = repr(float((k - 1) * (1 << 60)))
    bound_ppm = round(3 * 1000000 / (k - 2) ** 0.5)
    h = _md5_draw_sql(seed, "v")

    def est(sk: str) -> str:
        return f"""(
        SELECT CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE {est_num} / CAST(MAX(h) AS DOUBLE) END
        FROM {sk})"""

    return f"""
    WITH grams AS (
        SELECT CAST(substr(source, 4, 10) AS INTEGER) AS sid,
               unnest(list_transform(
                   range(1, greatest(length(text) - 9, 0) + 1),
                   i -> substr(text, CAST(i AS INT), 10))) AS v
        FROM documents
    ),
    av AS (SELECT v FROM grams WHERE sid < 10),
    bv AS (SELECT v FROM grams WHERE sid >= 10),
    sa AS (SELECT DISTINCT {h} AS h FROM av ORDER BY h LIMIT {k}),
    sb AS (SELECT DISTINCT {h} AS h FROM bv ORDER BY h LIMIT {k}),
    su AS (
        SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
        ORDER BY h LIMIT {k}
    ),
    jn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS j_num FROM su
        WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)
    ),
    ests AS (
        SELECT {est('sa')} AS est_a_raw,
               {est('sb')} AS est_b_raw,
               {est('su')} AS est_union_raw,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM su) AS u_sz
    ),
    exact AS (
        SELECT (SELECT CAST(COUNT(DISTINCT v) AS BIGINT) FROM av) AS true_a,
               (SELECT CAST(COUNT(DISTINCT v) AS BIGINT) FROM bv) AS true_b,
               (SELECT CAST(COUNT(DISTINCT v) AS BIGINT)
                FROM (SELECT v FROM av UNION ALL SELECT v FROM bv)) AS true_union
    )
    SELECT true_a,
           CAST(FLOOR(est_a_raw + 0.5) AS BIGINT) AS est_a,
           true_b,
           CAST(FLOOR(est_b_raw + 0.5) AS BIGINT) AS est_b,
           true_union,
           CAST(FLOOR(est_union_raw + 0.5) AS BIGINT) AS est_union,
           CAST(FLOOR(true_a + true_b - true_union) AS BIGINT)
               AS true_intersection,
           CAST(FLOOR(CAST(j_num AS DOUBLE) / CAST(u_sz AS DOUBLE)
                      * est_union_raw + 0.5) AS BIGINT) AS est_intersection,
           CAST(FLOOR(j_num * 1000000 / u_sz) AS BIGINT) AS est_jaccard_ppm,
           ABS(CAST(FLOOR(est_union_raw + 0.5) AS BIGINT) - true_union)
               * 1000000 <= {bound_ppm} * true_union AS within_3sigma
    FROM exact, ests, jn
    """


ORACLES["kmv_set_ops"] = _kmv_oracle()

# stream-equals-batch: min-union is idempotent and commutative, so
# the streamed KMV state must equal the one-shot batch sketch hash
# for hash
ORACLES["stream_kmv"] = f"""
    WITH vals AS (
        SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS v FROM orders
    )
    SELECT DISTINCT {_md5_draw_sql('kmv', 'v')} AS h FROM vals
    ORDER BY h LIMIT 256
"""


def _pit_oracle() -> str:
    vf = f"v * 800 + {_md5_draw_sql('scdv', 'c_custkey', 'v')} % 400"
    vt = (
        f"CASE WHEN v < 2 THEN (v + 1) * 800 + "
        f"{_md5_draw_sql('scdv', 'c_custkey', 'v + 1')} % 400 "
        f"ELSE 9999999 END"
    )
    seg = f"{_md5_draw_sql('seg', 'c_custkey', 'v')} % 5"
    return f"""
    WITH dim AS (
        SELECT c_custkey, v,
               {seg} AS segment,
               {vf} AS vf_day,
               {vt} AS vt_day
        FROM customer, (SELECT unnest([0, 1, 2]) AS v)
    ),
    fact AS (
        SELECT o_custkey,
               date_diff('day', DATE '1992-01-01',
                         CAST(o_orderdate AS DATE)) AS day,
               o_totalprice
        FROM orders
    )
    SELECT segment, v AS ver,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS sum_price
    FROM fact f
    JOIN dim d ON f.o_custkey = d.c_custkey
              AND f.day >= d.vf_day AND f.day < d.vt_day
    GROUP BY 1, 2
    """


ORACLES["pit_enrich"] = _pit_oracle()


def _k_core_oracle(k: int = 5, rounds: int = 6) -> str:
    # same synthesized domain graph as the triangle/pagerank oracles;
    # each peel round MATERIALIZED (chained CTEs that reference the
    # previous stage twice re-evaluate exponentially otherwise)
    stages = []
    for r in range(rounds):
        prev = "und" if r == 0 else f"e{r - 1}"
        stages.append(
            f"""d{r} AS MATERIALIZED (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (SELECT a AS v FROM {prev} UNION ALL SELECT b FROM {prev})
        GROUP BY 1
    ),
    e{r} AS MATERIALIZED (
        SELECT a, b FROM {prev}
        WHERE a NOT IN (SELECT v FROM d{r} WHERE degree < {k})
          AND b NOT IN (SELECT v FROM d{r} WHERE degree < {k})
    )"""
        )
    last = f"e{rounds - 1}"
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
    und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges),
    {','.join(stages)}
    SELECT idx.domain, f.degree
    FROM (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (SELECT a AS v FROM {last} UNION ALL SELECT b FROM {last})
        GROUP BY 1
    ) f JOIN idx ON f.v = idx.i
    """


ORACLES["domain_k_core"] = _k_core_oracle()

ORACLES["ivf_pq_topk"] = f"""
    WITH {_PQ_CTES},
    icb AS (
        SELECT ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS lid,
               embedding::DOUBLE[] AS cv
        FROM (SELECT vec_id, embedding FROM embeddings
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)
    ),
    asn AS (
        SELECT vec_id, lid FROM (
            SELECT e.vec_id, icb.lid,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY CAST(floor((list_dot_product(cv, cv)
                           - 2.0 * list_dot_product(e.embedding::DOUBLE[], cv))
                           * 10000.0 + 0.5) AS BIGINT), icb.lid) AS rk
            FROM embeddings e, icb
        ) WHERE rk = 1
    ),
    qroute AS (
        SELECT lid FROM (
            SELECT icb.lid,
                   CAST(floor((list_dot_product(cv, cv)
                       - 2.0 * list_dot_product(qq.qv, cv))
                       * 10000.0 + 0.5) AS BIGINT) AS d2
            FROM icb, (SELECT embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id = 0) qq
        ) ORDER BY d2, lid LIMIT 4
    ),
    short AS (
        SELECT vec_id FROM asn WHERE lid IN (SELECT lid FROM qroute)
    ),
    q AS (
        SELECT j, list_slice(embedding::DOUBLE[], j*8+1, j*8+8) AS qx
        FROM embeddings, subs WHERE vec_id = 0
    ),
    lut AS (
        SELECT csl.j, csl.cid,
               CAST(floor(list_dot_product(q.qx, csl.c) * 10000.0 + 0.5)
                    AS BIGINT) AS w
        FROM csl JOIN q ON q.j = csl.j
    ),
    scored AS (
        SELECT c.vec_id, CAST(SUM(l.w) AS BIGINT) AS adc_score_e4
        FROM codes c
        JOIN short s ON s.vec_id = c.vec_id
        JOIN lut l ON l.j = c.j AND l.cid = c.code
        WHERE c.vec_id <> 0
        GROUP BY c.vec_id
    )
    SELECT vec_id, adc_score_e4 FROM scored
    ORDER BY adc_score_e4 DESC, vec_id LIMIT 10
"""

def _bfs_oracle(seed: int = 0, rounds: int = 8) -> str:
    stages = []
    for r in range(rounds):
        prev = "d0" if r == 0 else f"d{r}"
        stages.append(
            f"""d{r + 1} AS MATERIALIZED (
        SELECT v, MIN(hops) AS hops FROM (
            SELECT v, hops FROM {prev}
            UNION ALL
            SELECT e.b AS v, {prev}.hops + 1 AS hops
            FROM {prev} JOIN bidir e ON e.a = {prev}.v
        ) GROUP BY v
    )"""
        )
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
    und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges),
    bidir AS (
        SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
    ),
    d0 AS (SELECT CAST({seed} AS BIGINT) AS v, CAST(0 AS BIGINT) AS hops),
    {','.join(stages)}
    SELECT idx.domain, CAST(f.hops AS BIGINT) AS hops
    FROM d{rounds} f JOIN idx ON f.v = idx.i
    """


ORACLES["domain_bfs_hops"] = _bfs_oracle()

ORACLES["event_transitions"] = """
    WITH seq AS (
        SELECT event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    cnt AS (
        SELECT event_type AS from_state, next_type AS to_state,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT from_state, CAST(SUM(n_transitions) AS BIGINT) AS t
        FROM cnt GROUP BY 1
    )
    SELECT from_state, to_state, n_transitions,
           CAST(FLOOR(n_transitions * 1000000 / t) AS BIGINT) AS prob_ppm
    FROM cnt JOIN tot USING (from_state)
"""


# stream-equals-batch: max-merge is idempotent and commutative, so
# the streamed register state must equal the one-shot batch registers
# exactly, cell for cell
ORACLES["stream_hll"] = (
    _hll_regs_sql(256, "hll")
    + "\n    SELECT grp, j, CAST(m_rank AS INTEGER) AS m_rank FROM regs"
)


# Overlapping-interval range join: the oracle recomputes the plain
# quadratic BETWEEN join — the bin-bucketed Spark plan must match it
# pair for pair (each qualifying pair meets in exactly one bin).
ORACLES["in_transit_orders"] = """
    WITH pts AS (
        SELECT o_orderkey,
               date_diff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS p_day
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-03-01'
          AND o_orderdate < TIMESTAMP '1995-04-01'
    ), iv AS (
        SELECT date_diff('day', DATE '1970-01-01',
                         CAST(l_shipdate AS DATE)) AS lo_day,
               date_diff('day', DATE '1970-01-01',
                         CAST(l_shipdate AS DATE))
                 + (CAST(l_quantity AS INTEGER) % 14 + 2) AS hi_day
        FROM lineitem
    )
    SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_in_transit
    FROM pts JOIN iv ON p_day BETWEEN lo_day AND hi_day
    GROUP BY o_orderkey
"""

ORACLES["join_cardinality_audit"] = """
    WITH sa AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_a,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ndv_a
        FROM orders
    ),
    sb AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv_b
        FROM lineitem
    ),
    j AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT n_a, ndv_a, n_b, ndv_b,
           CAST((n_a * n_b) // greatest(ndv_a, ndv_b) AS BIGINT) AS est_rows,
           actual_rows,
           CAST((actual_rows * 10000)
                // ((n_a * n_b) // greatest(ndv_a, ndv_b)) AS BIGINT)
               AS ratio_e4
    FROM sa, sb, j
"""

# Streaming trending top-k: hourly tumbling counts + rank cut.
ORACLES["stream_trending"] = """
    WITH c AS (
        SELECT date_trunc('hour', ts) AS win_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY win_start
            ORDER BY n_events DESC, event_type ASC
        ) AS rnk
        FROM c
    )
    SELECT win_start, event_type, n_events, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
"""

# Snapshot diff: the old/new membership and the text perturbation are
# pure functions of doc_id, so the oracle classifies arithmetically
# (fingerprints only differ where the text was perturbed).
ORACLES["corpus_snapshot_diff"] = """
    WITH s AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 0 AND doc_id % 13 <> 0
                        THEN 'added'
                    WHEN doc_id % 13 = 0 AND doc_id % 10 <> 0
                        THEN 'removed'
                    WHEN doc_id % 7 = 0 AND doc_id % 10 <> 0
                         AND doc_id % 13 <> 0 THEN 'changed'
                    WHEN doc_id % 10 <> 0 AND doc_id % 13 <> 0
                        THEN 'unchanged'
               END AS status
        FROM documents
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM s WHERE status IS NOT NULL GROUP BY status
"""

# Schema evolution: even keys written pre-evolution surface NULL for
# the late o_orderstatus column.
ORACLES["schema_evolution_read"] = """
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END
               AS o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY 1
"""

ORACLES["conform_schema"] = """
    SELECT CAST(CAST(o_orderkey AS INT) AS BIGINT) AS o_orderkey,
           o_custkey,
           o_orderstatus,
           CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS o_totalprice,
           o_orderdate,
           CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders
"""

ORACLES["cube_profile"] = """
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(GROUPING(lang, source) AS BIGINT) AS gid
    FROM documents GROUP BY CUBE (lang, source)
"""

ORACLES["key_skew_report"] = """
    WITH counts AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
    ),
    stats AS (
        SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows,
               MAX(n) AS max_key_rows
        FROM counts
    )
    SELECT c.user_id AS key, c.n AS key_rows, s.n_keys, s.n_rows,
           s.max_key_rows,
           ROUND(c.n * 1.0 / s.n_rows, 6) AS share,
           ROUND(c.n * 1.0 * s.n_keys / s.n_rows, 4) AS skew_factor
    FROM counts c, stats s
    ORDER BY c.n DESC, c.user_id ASC LIMIT 5
"""

ORACLES["weighted_sample"] = """
    WITH draws AS (
        SELECT lang, doc_id, n_chars,
               -ln((CAST('0x' || substr(md5(concat_ws(':', 'wsample',
                        CAST(lang AS VARCHAR), CAST(doc_id AS VARCHAR))),
                    1, 8) AS BIGINT) + 1) / 4294967296.0) / n_chars AS akey
        FROM documents
        WHERE n_chars > 0
    ),
    ranked AS (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY akey ASC, doc_id ASC) AS rk
        FROM draws
    )
    SELECT lang, doc_id, n_chars FROM ranked WHERE rk <= 5
"""

# stream-equals-batch: min-k merge of content-hash A-ES keys is
# idempotent and commutative, so the streamed reservoir must equal
# the one-shot batch weighted sample row for row
ORACLES["stream_reservoir"] = ORACLES["weighted_sample"]

ORACLES["stream_attribution"] = """
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           p.value, c.event_id AS click_id, c.ts AS click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 4 HOUR
"""

# the streaming aggregation must converge to EXACTLY the batch digest
ORACLES["stream_merkle_digests"] = _merkle_digest_sql(
    "SELECT * FROM events", "event_id", _EVENTS_DIGEST_EXPRS
)

ORACLES["order_priority_check"] = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY
      )
    GROUP BY 1
"""

ORACLES["top_value_parts"] = """
    WITH per_part AS (
        SELECT l_partkey,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                   AS BIGINT) AS revenue_e4
        FROM lineitem GROUP BY 1
    ),
    t AS (SELECT SUM(revenue_e4) AS tot, COUNT(*) AS n FROM per_part)
    SELECT l_partkey, revenue_e4
    FROM per_part, t
    WHERE revenue_e4 * n * 2 > tot * 3
"""

ORACLES["large_volume_orders"] = """
    SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, CAST(q.total_qty AS DOUBLE) AS total_qty
    FROM orders o
    JOIN (
        SELECT l_orderkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    ) q ON o.o_orderkey = q.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
"""

# Exact substring-duplication coverage (k=5 word grams): postings of
# md5-prefix gram hashes -> global count >= 2 -> per-doc interval
# union (gaps-and-islands), mirroring operators/dedup.py
# substring_dup_spans step for step.
ORACLES["substring_dup_spans"] = """
    WITH tk AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    pg AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               CAST('0x' || substr(md5(array_to_string(
                   list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 4),
                   ' ')), 1, 15) AS BIGINT) AS gh
        FROM (SELECT doc_id, toks,
                     unnest(range(1, CAST(n_tokens AS INT) - 3)) AS i
              FROM tk WHERE n_tokens >= 5)
    ),
    dup AS (SELECT gh FROM pg GROUP BY gh HAVING COUNT(*) >= 2),
    hits AS (SELECT doc_id, pos FROM pg JOIN dup USING (gh)),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(MAX(pos + 4) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) + 1
                    THEN 1 ELSE 0 END AS nw
        FROM hits
    ),
    isl2 AS (
        SELECT doc_id, pos,
               SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        FROM isl
    ),
    spans AS (
        SELECT doc_id, g, MIN(pos) AS s, MAX(pos) + 4 AS e
        FROM isl2 GROUP BY doc_id, g
    ),
    pd AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
               CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
        FROM spans GROUP BY doc_id
    )
    SELECT tk.doc_id, tk.n_tokens,
           CAST(COALESCE(pd.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(COALESCE(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           ROUND(COALESCE(pd.dup_tokens, 0) * 1.0 / tk.n_tokens, 4)
               AS dup_frac
    FROM tk LEFT JOIN pd USING (doc_id)
"""

# T5 span corruption: per-position md5 coin (< floor(0.15 * 2^32) =
# 644245094), masked runs -> numbered sentinels, string_agg ordered by
# pos re-assembles both sequences.  Mirrors operators/text.py
# span_corrupt step for step.
ORACLES["span_corrupt"] = """
    WITH tk AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    pos AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[CAST(i AS INT)] AS tok
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
              FROM tk)
    ),
    m AS (
        SELECT doc_id, pos, tok,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                   CAST(pos AS VARCHAR)), 1, 8) AS BIGINT) < 644245094
                   AS masked
        FROM pos
    ),
    r AS (
        SELECT doc_id, pos, tok, masked,
               CASE WHEN masked AND NOT COALESCE(
                        LAG(masked) OVER (PARTITION BY doc_id ORDER BY pos),
                        FALSE)
                    THEN 1 ELSE 0 END AS rs
        FROM m
    ),
    r2 AS (
        SELECT doc_id, pos, tok, masked, rs,
               SUM(rs) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
        FROM r
    ),
    pieces AS (
        SELECT doc_id, pos, masked, rs,
               CASE WHEN NOT masked THEN tok
                    WHEN rs = 1 THEN '<extra_id_' ||
                        CAST(rid - 1 AS VARCHAR) || '>' END AS cp,
               CASE WHEN masked AND rs = 1 THEN '<extra_id_' ||
                        CAST(rid - 1 AS VARCHAR) || '> ' || tok
                    WHEN masked THEN tok END AS tp
        FROM r2
    )
    SELECT doc_id,
           COALESCE(string_agg(cp, ' ' ORDER BY pos), '') AS corrupted_text,
           COALESCE(string_agg(tp, ' ' ORDER BY pos), '') AS target_text,
           CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
               AS n_masked,
           CAST(SUM(rs) AS BIGINT) AS n_spans
    FROM pieces GROUP BY doc_id
"""

# Preference pairs: integer-exact quality_e6x10 (operators/text.py
# quality_score_e6 — micro-unit integer arithmetic, no float rounding
# boundary), i-th best vs i-th worst per source, strict-positive
# margin.  Crossed/self pairs (group smaller than 2k) die on the
# margin filter in both engines.
ORACLES["preference_pairs"] = """
    WITH base AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               CAST(len(list_filter(string_split(text, ' '),
                   t -> list_contains(
                       ['the','a','of','to','and','in','is'], t)))
                   AS BIGINT) AS n_stop
        FROM documents
    ),
    q AS (
        SELECT doc_id, source,
               7 * least(n_tok * 15625, 1000000)
               + 3 * least(CAST(floor(5000000 * n_stop * 1.0 / n_tok)
                               AS BIGINT), 1000000) AS quality_e6x10
        FROM base
    ),
    r AS (
        SELECT source, doc_id, quality_e6x10,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY quality_e6x10 DESC, doc_id ASC) AS rb,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY quality_e6x10 ASC, doc_id DESC) AS rw
        FROM q
    )
    SELECT c.source, CAST(c.rb AS BIGINT) AS pair_ix,
           c.doc_id AS chosen_id, j.doc_id AS rejected_id,
           CAST(c.quality_e6x10 AS BIGINT) AS chosen_score,
           CAST(j.quality_e6x10 AS BIGINT) AS rejected_score,
           CAST(c.quality_e6x10 - j.quality_e6x10 AS BIGINT) AS margin
    FROM r c JOIN r j ON c.source = j.source AND c.rb = j.rw
    WHERE c.rb <= 5 AND j.rw <= 5
      AND c.quality_e6x10 > j.quality_e6x10
"""


# LWW merge: update wins iff its writetime (500) >= the base row's
# (ties favor the update); stale updates leave the base row intact.
ORACLES["cow_merge_lww"] = """
    WITH b AS (
        SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM orders
    ),
    base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(o_orderkey % 1000 AS BIGINT) AS wt
        FROM orders
    )
    SELECT o.o_orderkey,
           CASE WHEN o.o_orderkey <= b.lo + (b.hi - b.lo) // 8
                     AND o.wt <= 500
                THEN o.o_totalprice + 100.0 ELSE o.o_totalprice
           END AS o_totalprice,
           CASE WHEN o.o_orderkey <= b.lo + (b.hi - b.lo) // 8
                     AND o.wt <= 500
                THEN CAST(500 AS BIGINT) ELSE o.wt
           END AS wt
    FROM base o, b
"""


# CDF: the diff is exactly the update batch — bumped rows as updates
# (old/new price), shifted rows as inserts, nothing else.
ORACLES["snapshot_changes_feed"] = """
    WITH b AS (
        SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM orders
    )
    SELECT o.o_orderkey, 'update' AS change_type,
           o.o_totalprice AS old_price,
           o.o_totalprice + 100.0 AS new_price
    FROM orders o, b
    WHERE o.o_orderkey <= b.lo + (b.hi - b.lo) // 8
    UNION ALL
    SELECT i.o_orderkey + b.hi + 1 AS o_orderkey, 'insert' AS change_type,
           CAST(NULL AS DOUBLE) AS old_price,
           i.o_totalprice + 5.0 AS new_price
    FROM (
        SELECT o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
        FROM orders
    ) i, b
    WHERE i.rn <= 20
"""


# Streaming COW upserts: the ordered-sliced streamed fold equals the
# one-shot changelog collapse (cdc_apply semantics, D keys absent).
ORACLES["stream_cow_upsert"] = """
    WITH log AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type = 'error' THEN 'D'
                    WHEN event_type = 'signup' THEN 'I'
                    ELSE 'U' END AS op
        FROM events
        WHERE user_id % 3 = 0
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM log
    )
    SELECT user_id, ts, event_id, value
    FROM ranked WHERE rn = 1 AND op <> 'D'
"""


# COW delete: remaining table = orders above the purge threshold.
ORACLES["cow_delete_purge"] = """
    WITH b AS (
        SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM orders
    )
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders, b
    WHERE o_orderkey > b.lo + (b.hi - b.lo) // 8
"""


# Time travel: reading AS OF v0 after a merge equals the raw table.
ORACLES["cow_time_travel"] = """
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
"""


# Secondary index: the index path must return exactly the base rows
# a direct predicate returns.
ORACLES["secondary_index_lookup"] = """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_custkey = (
        SELECT o_custkey FROM orders
        WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders)
    )
"""


# COW merge: expected table = orders with the low-eighth price bump
# applied, plus the 20 shifted insert rows.
ORACLES["cow_merge_upsert"] = """
    WITH b AS (
        SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM orders
    ),
    upd AS (
        SELECT o_orderkey, o_totalprice + 100.0 AS p
        FROM orders, b
        WHERE o_orderkey <= b.lo + (b.hi - b.lo) // 8
    ),
    ins AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM (
            SELECT o_orderkey, o_totalprice, o_orderstatus,
                   ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 20
    )
    SELECT o.o_orderkey,
           COALESCE(u.p, o.o_totalprice) AS o_totalprice,
           o.o_orderstatus
    FROM orders o LEFT JOIN upd u USING (o_orderkey)
    UNION ALL
    SELECT i.o_orderkey + b.hi + 1 AS o_orderkey,
           i.o_totalprice + 5.0 AS o_totalprice,
           i.o_orderstatus
    FROM ins i, b
"""


# Incremental LSH probe: same 4-hash/2-band md5 MinHash as the batch
# dedup oracle, seen = first half of the corpus by doc_id, candidates
# from band agreement, exact-Jaccard verify, best match per new doc.
ORACLES["lsh_index_incremental"] = f"""
    WITH {_SIGS_CTE},
    half AS (SELECT COUNT(*) // 2 AS h FROM documents),
    cands AS (
        SELECT DISTINCT nw.doc_id AS new_id, sn.doc_id AS seen_id
        FROM sigs nw, sigs sn, half
        WHERE nw.doc_id >= half.h AND sn.doc_id < half.h
          AND ((nw.sig0 = sn.sig0 AND nw.sig1 = sn.sig1)
            OR (nw.sig2 = sn.sig2 AND nw.sig3 = sn.sig3))
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.new_id, c.seen_id, COUNT(*) AS i
        FROM cands c
        JOIN sh a ON a.doc_id = c.new_id
        JOIN sh b ON b.doc_id = c.seen_id AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT new_id, seen_id,
               ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) AS j
        FROM inter
        JOIN sizes sa ON sa.doc_id = new_id
        JOIN sizes sb ON sb.doc_id = seen_id
        WHERE ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) >= 0.5
    ),
    best AS (
        SELECT new_id, seen_id, j,
               ROW_NUMBER() OVER (PARTITION BY new_id
                   ORDER BY j DESC, seen_id ASC) AS rn
        FROM scored
    )
    SELECT d.doc_id,
           CAST(b.seen_id AS BIGINT) AS match_id,
           b.j AS jaccard,
           CAST(CASE WHEN b.seen_id IS NULL THEN 1 ELSE 0 END
               AS BIGINT) AS is_novel
    FROM (SELECT doc_id FROM documents, half WHERE doc_id >= half.h) d
    LEFT JOIN best b ON b.new_id = d.doc_id AND b.rn = 1
"""


# Line-wise dedup: same synthetic page construction, same md5-keyed
# >=2-distinct-doc rule, survivors re-joined in line order.
ORACLES["line_dedup_docs"] = f"""
    WITH pages AS (
        SELECT d.doc_id,
               concat_ws(chr(10), d.text,
                   CASE WHEN d.doc_id % 5 = 0 THEN b.text END,
                   CASE WHEN d.doc_id % 3 = 0 THEN '{_LINE_BOILER}' END
               ) AS text
        FROM documents d
        JOIN documents b
          ON b.doc_id = (d.doc_id + 17) % (SELECT COUNT(*) FROM documents)
    ),
    lines AS (
        SELECT doc_id,
               unnest(string_split(text, chr(10))) AS line,
               unnest(generate_series(1,
                   len(string_split(text, chr(10))))) AS pos
        FROM pages
    ),
    hashed AS (SELECT doc_id, pos, line, md5(line) AS h FROM lines),
    common AS (
        SELECT h FROM (
            SELECT h, COUNT(DISTINCT doc_id) AS c FROM hashed
            WHERE length(line) >= 10 GROUP BY h
        ) WHERE c >= 2
    ),
    kept AS (SELECT * FROM hashed WHERE h NOT IN (SELECT h FROM common)),
    tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM hashed GROUP BY doc_id),
    agg AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(a.clean_text, '') AS clean_text,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(t.n_lines - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
    FROM tot t LEFT JOIN agg a USING (doc_id)
"""




register_queries(globals())
__all__ = export_all(globals())
