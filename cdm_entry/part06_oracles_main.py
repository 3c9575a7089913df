"""Main oracle registration block: DuckDB twins for the §2 operator queries.

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry.part05_oracle_fragments import *  # noqa: F401,F403

ORACLES.update({
    "synthetic_users": _synthetic_users_oracle(),
    "traffic_ops_mix": _traffic_ops_mix_oracle(),
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "full_scan": "SELECT * FROM nation",
    "projection": "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "column_exclude": "SELECT c_custkey, c_nationkey, c_mktsegment FROM customer",
    "filter_eq": "SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'",
    "token_range_filter": "SELECT * FROM orders WHERE (o_orderkey % 32) BETWEEN 3 AND 7",
    "connector_scan": """
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price
        FROM orders WHERE (o_orderkey % 32) BETWEEN 3 AND 7
        GROUP BY o_orderstatus
    """,
    "point_lookup": "SELECT * FROM lineitem WHERE l_orderkey = 0 AND l_linenumber = 4",
    "grouped_count": (
        "SELECT o_orderstatus, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus"
    ),
    "writetime_filter": """
        SELECT *, epoch_us(ts) AS _writetime
        FROM events WHERE epoch_us(ts) >= 1705276800000000
    """,
    "guardrail_violations": """
        SELECT * FROM documents
        WHERE octet_length(encode(text)) / 1024.0 > 0.35
    """,
    "traffic_summary": """
        SELECT COUNT(*) AS total_ops,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
               ROUND(100.0 * (1 - SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::DOUBLE / COUNT(*)), 4) AS success_rate_pct,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 4) AS DOUBLE) AS total_value,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*), 4) AS avg_value
        FROM events
    """,
    "latency_percentiles": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 4) AS p50,
               ROUND(quantile_cont(value, 0.95), 4) AS p95,
               ROUND(quantile_cont(value, 0.99), 4) AS p99,
               ROUND(AVG(value), 4) AS avg_value,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    """,
    "sliding_rate": """
        WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        x AS (
            SELECT (sec // 300) * 300 AS ws FROM e
            UNION ALL
            SELECT ((sec // 300) - 1) * 300 AS ws FROM e
        )
        SELECT ws AS window_start_sec,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               ROUND(COUNT(*) / 600.0, 6) AS ops_per_sec
        FROM x GROUP BY 1
    """,
    "windowed_rate": """
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               COUNT(*) AS cnt,
               ROUND(COUNT(*) / 300.0, 6) AS ops_per_sec
        FROM events GROUP BY 1
    """,
    "rowwise_greatest": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax,
               GREATEST(l_quantity, l_discount, l_tax) AS row_max
        FROM lineitem
    """,
    "latest_event_per_user": """
        SELECT event_id, ts, user_id, event_type, value, props FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "limit_n": "SELECT * FROM orders ORDER BY o_orderkey LIMIT 10",
    "union_summary": """
        SELECT 'customer' AS table_name, COUNT(*) AS row_count FROM customer
        UNION ALL SELECT 'orders', COUNT(*) FROM orders
        UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    """,
    "value_set_diff": """
        SELECT DISTINCT c_nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS c_nationkey FROM supplier
        WHERE s_acctbal > 9500
    """,
    "string_funcs": """
        SELECT c_custkey,
               LOWER(c_name) AS name_lower,
               CONCAT(LOWER(c_mktsegment), '@example.com') AS segment_email
        FROM customer WHERE c_name LIKE 'Customer#0000001%'
    """,
    "date_funcs": """
        SELECT o_orderkey,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
               EXTRACT(YEAR FROM o_orderdate) AS order_year,
               EXTRACT(MONTH FROM o_orderdate) AS order_month,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAYS, '%Y-%m-%d') AS due_date
        FROM orders
    """,
    "round_cast": """
        SELECT o_orderkey,
               CAST(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)) AS DOUBLE) AS total_decimal
        FROM orders
    """,
    "row_hash": """
        SELECT n_nationkey,
               MD5(CONCAT_WS('|', CAST(n_nationkey AS VARCHAR), n_name,
                             CAST(n_regionkey AS VARCHAR))) AS row_hash
        FROM nation
    """,
    "json_extract": """
        SELECT event_id, json_extract_string(props, '$.k') AS k_value FROM events
    """,
    "word_explode_count": """
        SELECT token, COUNT(*) AS occurrences FROM (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ) GROUP BY token
    """,
    "token_count": """
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    """,
    "text_quality": """
        SELECT doc_id,
               length(text) AS n_chars_computed,
               len(string_split(text, ' ')) AS n_tokens,
               ROUND((length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
                     / len(string_split(text, ' ')), 4) AS avg_token_len,
               ROUND(len(list_filter(string_split(text, ' '),
                         t -> list_contains(['the','a','of','to','and','in','is'], t)))::DOUBLE
                     / len(string_split(text, ' ')), 4) AS stopword_ratio
        FROM documents
    """,
    "lang_id": _lang_id_oracle(),
    "doc_fingerprint": """
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    """,
    "dedup_exact": """
        WITH keyed AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents
        ),
        groups AS (
            SELECT fp, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size
            FROM keyed GROUP BY fp
        )
        SELECT k.doc_id, g.canonical_id, g.group_size
        FROM keyed k JOIN groups g USING (fp)
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLES_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) >= 0.5
    """,
    "dup_clusters": f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) >= 0.5
        ),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
        ),
        comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id)
        SELECT doc_id, component,
               COUNT(*) OVER (PARTITION BY component) AS cluster_size
        FROM comp
    """,
    "hash_split_counts": f"""
        WITH b AS (SELECT {bucket_sql('doc_id')} AS bucket FROM documents)
        SELECT CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs
        FROM b GROUP BY 1
    """,
    "corpus_sample": f"""
        SELECT doc_id FROM documents
        WHERE {bucket_sql('doc_id', 'sample')} < 2500
    """,
    "group_split_counts": f"""
        WITH b AS (
            SELECT source, {bucket_sql('source', 'grp')} AS bucket FROM documents
        )
        SELECT CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM b GROUP BY 1
    """,
    "negative_pairs": f"""
        WITH n AS (SELECT COUNT(*) AS N FROM documents),
        a AS (
            SELECT doc_id, CAST(unnest(range(0, 3)) AS INTEGER) AS neg_ix
            FROM documents
        ),
        d AS (
            SELECT doc_id, neg_ix,
                   {_md5_draw_sql("neg", "doc_id", "neg_ix")} % (N - 1) AS dd
            FROM a, n
        ),
        x AS (
            SELECT doc_id, neg_ix,
                   CASE WHEN dd >= doc_id THEN dd + 1 ELSE dd END AS neg_id
            FROM d
        )
        SELECT x.doc_id, x.neg_ix, x.neg_id, p.source AS neg_source
        FROM x JOIN documents p ON p.doc_id = x.neg_id
    """,
    "mixture_sample": f"""
        SELECT doc_id, 'short' AS source FROM documents
        WHERE length(text) < 330 AND {bucket_sql('doc_id', 'short')} < 9000
        UNION ALL
        SELECT doc_id, 'long' AS source FROM documents
        WHERE length(text) >= 330 AND {bucket_sql('doc_id', 'long')} < 3000
    """,
    "doc_chunks": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        c AS (
            SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / 32.0) AS INT))) AS chunk_id
            FROM t
        )
        SELECT doc_id, chunk_id,
               array_to_string(list_slice(toks, chunk_id*32 + 1, chunk_id*32 + 32), ' ') AS chunk_text,
               len(list_slice(toks, chunk_id*32 + 1, chunk_id*32 + 32)) AS n_chunk_tokens
        FROM c
    """,
    "pii_redact": """
        SELECT doc_id,
               regexp_replace(text, '\\bcustomer\\b', '<ENTITY>', 'g') AS redacted,
               len(regexp_extract_all(text, '\\bcustomer\\b')) AS n_redacted
        FROM documents
    """,
    "topk_per_group": """
        SELECT doc_id, lang, n_chars FROM (
            SELECT doc_id, lang, n_chars, ROW_NUMBER() OVER (
                PARTITION BY lang ORDER BY n_chars DESC, doc_id DESC) AS rn
            FROM documents
        ) WHERE rn <= 3
    """,
    "label_centroids": """
        SELECT label, i AS pos,
               ROUND(CAST(SUM(CAST(embedding[i] AS DECIMAL(20,10))) AS DOUBLE)
                     / COUNT(*), 4) AS centroid
        FROM embeddings, range(1, 65) t(i)
        GROUP BY 1, 2
    """,
    "corpus_curation": f"""
        WITH qf AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   ROUND(len(list_filter(string_split(text, ' '),
                         t -> list_contains(['the','a','of','to','and','in','is'], t)))::DOUBLE
                         / len(string_split(text, ' ')), 4) AS stopword_ratio
            FROM documents
        ),
        canon AS (
            SELECT MIN(doc_id) AS doc_id
            FROM (SELECT doc_id,
                         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
                  FROM documents)
            GROUP BY fp
        ),
        kept AS (
            SELECT qf.doc_id, qf.n_tokens
            FROM qf JOIN canon USING (doc_id)
            WHERE n_tokens >= 20 AND stopword_ratio >= 0.02
        )
        SELECT CASE WHEN {bucket_sql('doc_id')} < 8000 THEN 'train'
                    WHEN {bucket_sql('doc_id')} < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               ROUND(AVG(n_tokens), 4) AS avg_tokens
        FROM kept GROUP BY 1
    """,
    "minhash_signatures": f"""
        WITH {_SIGS_CTE}
        SELECT * FROM sigs
    """,
    "lsh_candidates": f"""
        WITH {_SIGS_CTE}
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sigs a JOIN sigs b
          ON a.doc_id < b.doc_id
         AND ((a.sig0 = b.sig0 AND a.sig1 = b.sig1)
           OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))
    """,
    "simhash": _simhash_oracle(),
    "cosine_topk": f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS a_v FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT b.vec_id,
                   ROUND({_COS_SIM.replace('b_v', 'b.embedding::DOUBLE[]')}, 4) AS cos_sim
            FROM embeddings b, q
            WHERE b.vec_id <> 0
        )
        SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    "salted_join": """
        SELECT o_orderstatus,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
    "minhash_lsh_dedup": f"""
        WITH {_SIGS_CTE},
        cands AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sigs a JOIN sigs b
              ON a.doc_id < b.doc_id
             AND ((a.sig0 = b.sig0 AND a.sig1 = b.sig1)
               OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT c.id_a, c.id_b, COUNT(*) AS i
            FROM cands c
            JOIN sh a ON a.doc_id = c.id_a
            JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) >= 0.5
    """,
    "ivf_topk": f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS a_v FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT b.vec_id,
                   ROUND({_COS_SIM.replace('b_v', 'b.embedding::DOUBLE[]')}, 4) AS cos_sim
            FROM embeddings b, q
        )
        SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    "ann_lsh_pairs": f"""
        WITH planes AS (
            SELECT p, list((s - floor(s)) * 2 - 1 ORDER BY d) AS plane
            FROM (
                SELECT p, d,
                       sin(42 * 1000003 + p * 10007 + d * 101) * 43758.5453 AS s
                FROM range(0, 4) t1(p), range(0, 64) t2(d)
            )
            GROUP BY p
        ),
        coded AS (
            SELECT vec_id, embedding::DOUBLE[] AS ev,
                   SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], plane) >= 0
                            THEN (1 << p) ELSE 0 END)::INT AS bucket
            FROM embeddings, planes
            GROUP BY vec_id, embedding
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND({_COS_SIM.replace('a_v', 'a.ev').replace('b_v', 'b.ev')}, 4) AS cos_sim
        FROM coded a JOIN coded b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE ROUND({_COS_SIM.replace('a_v', 'a.ev').replace('b_v', 'b.ev')}, 4) >= 0.3
    """,
    "rp_projection": (
        """
        WITH planes AS (
            SELECT p, list((s - floor(s)) * 2 - 1 ORDER BY d) AS plane
            FROM (
                SELECT p, d,
                       sin(7 * 1000003 + p * 10007 + d * 101) * 43758.5453 AS s
                FROM range(0, 8) t1(p), range(0, 64) t2(d)
            )
            GROUP BY p
        ),
        v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
        SELECT vec_id,
        """
        + ",\n               ".join(
            f"ROUND(SUM(CASE WHEN p = {p} THEN list_dot_product(ev, plane) END), 4) AS rp{p}"
            for p in range(8)
        )
        + """
        FROM v, planes
        GROUP BY vec_id
        """
    ),
    "embedding_near_dup": f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND({_COS_SIM.replace('a_v', 'a.ev').replace('b_v', 'b.ev')}, 4) AS cos_sim
        FROM v a, v b
        WHERE a.vec_id < b.vec_id
          AND ROUND({_COS_SIM.replace('a_v', 'a.ev').replace('b_v', 'b.ev')}, 4) >= 0.45
    """,
    "temperature_mixture": f"""
        WITH c AS (
            SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1
        ),
        r AS (
            SELECT event_type,
                   CAST(LEAST(ROUND(0.3 * (SUM(n) OVER ())
                        * pow(n, 0.5) / (SUM(pow(n, 0.5)) OVER ())
                        / n * 1000000.0, 0), 1000000.0) AS BIGINT)
                       AS rate_e6
            FROM c
        )
        SELECT e.event_id, e.event_type, r.rate_e6
        FROM events e JOIN r USING (event_type)
        WHERE {_md5_draw_sql('tempmix', 'e.event_type', 'e.event_id')}
              % 1000000 < r.rate_e6
    """,
    "semantic_decontaminate": f"""
        WITH bench AS (
            SELECT vec_id AS b_id, embedding::DOUBLE[] AS b_v
            FROM embeddings WHERE vec_id % 20 = 0
        ),
        corp AS (
            SELECT vec_id, embedding::DOUBLE[] AS a_v
            FROM embeddings WHERE vec_id % 20 <> 0
        ),
        scored AS (
            SELECT c.vec_id, b.b_id, ROUND({_COS_SIM}, 4) AS cs
            FROM corp c, bench b
        ),
        agg AS (
            SELECT vec_id, MAX(cs) AS max_benchmark_sim
            FROM scored GROUP BY 1
        )
        SELECT s.vec_id,
               MIN(s.b_id) AS nearest_benchmark_id,
               a.max_benchmark_sim,
               a.max_benchmark_sim >= 0.4 AS contaminated
        FROM scored s
        JOIN agg a ON s.vec_id = a.vec_id AND s.cs = a.max_benchmark_sim
        GROUP BY s.vec_id, a.max_benchmark_sim
    """,
    "multimodal_features": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS content_md5
        FROM documents
    """,
    "csv_roundtrip": "SELECT * FROM nation",
    "csv_gzip_roundtrip": "SELECT * FROM region",
    "json_roundtrip": "SELECT * FROM supplier",
    "csv_import_quarantine": (
        "SELECT * FROM customer WHERE c_custkey % 7 <> 0"
    ),
    "migrate_pipeline": """
        SELECT c_custkey, c_name, c_acctbal, 'origin' AS source_cluster
        FROM customer WHERE c_acctbal > 5000
    """,
    "migrate_bulk": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               'origin' AS source_cluster
        FROM lineitem
    """,
    "migrate_dry_run": """
        SELECT CAST(COUNT(*) AS BIGINT) AS rows_read,
               CAST(0 AS BIGINT) AS rows_written
        FROM orders WHERE o_orderstatus = 'O'
    """,
    "run_tracker_resume": "SELECT * FROM orders WHERE o_orderkey % 8 >= 4",
    # invariant oracle: the migration is lossless, so every check line
    # of the validate_migration.py:69-81 report must read PASS with
    # equal counts and zero sample failures
    "lab_migration_report": """
        WITH t(table_name, tbl_rows) AS (
            SELECT 'orders', (SELECT COUNT(*) FROM orders)
            UNION ALL SELECT 'products', (SELECT COUNT(*) FROM part)
            UNION ALL SELECT 'user_activity', (SELECT COUNT(*) FROM events)
            UNION ALL SELECT 'users', (SELECT COUNT(*) FROM customer)
        )
        SELECT table_name,
               CAST(tbl_rows AS BIGINT) AS origin_rows,
               CAST(tbl_rows AS BIGINT) AS target_rows,
               'PASS' AS count_check,
               CAST(LEAST(tbl_rows, 100) AS BIGINT) AS sampled,
               CAST(0 AS BIGINT) AS sample_failures,
               'PASS' AS sample_check
        FROM t
    """,
    # page sizes are deterministic even though page CONTENT follows
    # partition iteration order: every page except the last is exactly
    # full; the key checksum proves completeness
    "paged_fetch_audit": """
        WITH r AS (
            SELECT c_custkey,
                   (ROW_NUMBER() OVER (ORDER BY c_custkey) - 1) // 100
                       AS pg
            FROM customer
        )
        SELECT CAST(pg AS BIGINT) AS page_id,
               CAST(COUNT(*) AS BIGINT) AS page_rows,
               (SELECT COUNT(*) FROM customer) AS total_rows,
               (SELECT CAST(SUM(c_custkey) AS BIGINT)
                FROM customer) AS total_key_sum
        FROM r GROUP BY pg
    """,
    # the sketch estimates are engine-specific but their error bounds
    # are not: the Spark side VERIFIES the bounds and emits booleans,
    # the oracle asserts they all hold
    "sketch_profile": """
        SELECT source, COUNT(*) AS n_docs,
               TRUE AS distinct_ok, TRUE AS median_rank_ok
        FROM documents GROUP BY source
    """,
    "lww_merge": """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
                    ELSE o_totalprice END AS o_totalprice,
               CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey * 2 + 1
                         ELSE o_orderkey * 2 END AS BIGINT) AS _writetime
        FROM orders
    """,
    "autocorrect_lww": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority, CAST(1000 AS BIGINT) AS _writetime
        FROM orders WHERE o_orderkey % 10 = 0 OR o_orderkey % 14 <> 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1,
               o_orderdate, o_orderpriority, CAST(2000 AS BIGINT) AS _writetime
        FROM orders WHERE o_orderkey % 10 <> 0 AND o_orderkey % 14 = 0
    """,
    "writetime_shift": """
        SELECT event_id, epoch_us(ts) + 1000000 AS _writetime FROM events
    """,
    "counter_merge": """
        SELECT l_orderkey,
               CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS counter_value
        FROM lineitem GROUP BY l_orderkey
    """,
    "order_items_list": """
        SELECT l_orderkey,
               string_agg(l_partkey::VARCHAR, ',' ORDER BY l_partkey) AS items
        FROM lineitem GROUP BY l_orderkey
    """,
    "map_explode": """
        SELECT event_id, 'event_type' AS props_map_key,
               event_type AS props_map_value
        FROM events
        UNION ALL
        SELECT event_id, 'k', json_extract_string(props, '$.k') FROM events
    """,
    "alert_error_windows": """
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
               'error_count_breach' AS alert
        FROM events
        GROUP BY time_bucket(INTERVAL '1 hour', ts)
        HAVING SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 5
    """,
    "fk_join_enrich": """
        SELECT o_orderkey, o_custkey AS c_custkey, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "write_batches": f"""
        SELECT o_orderkey, o_custkey,
               CAST((ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY {_md5_draw_sql("batch:o", "o_orderkey")}, o_orderkey
               ) - 1) // 5 AS INT) AS batch_seq
        FROM orders
    """,
    "writetime_collapse": """
        SELECT o_orderkey,
               CAST(o_orderkey * 1000000 + 1 AS BIGINT) AS wt_no_collections,
               CAST(greatest(o_orderkey * 1000000 + 1,
                             o_orderkey * 1000000 + 2) AS BIGINT)
                   AS wt_with_collections
        FROM orders
    """,
    "schema_diff": """
        SELECT 'c_acctbal' AS col_name,
               lower(typeof(c_acctbal)) AS col_type,
               'origin_only' AS side
        FROM customer LIMIT 1
    """,
    "sample_validate": f"""
        WITH target AS ({_TARGET_SQL}),
        s AS (
            SELECT * FROM orders
            ORDER BY {_md5_draw_sql("sampleval", "o_orderkey")}, o_orderkey
            LIMIT 100
        ),
        j AS (
            SELECT s.o_orderkey,
                   (t.o_orderkey IS NOT NULL) AS found_flag,
                   CASE WHEN t.o_orderkey IS NOT NULL AND (
                        s.o_custkey IS DISTINCT FROM t.o_custkey
                     OR s.o_orderstatus IS DISTINCT FROM t.o_orderstatus
                     OR s.o_totalprice IS DISTINCT FROM t.o_totalprice
                     OR s.o_orderdate IS DISTINCT FROM t.o_orderdate
                     OR s.o_orderpriority IS DISTINCT FROM t.o_orderpriority
                   ) THEN 1 ELSE 0 END AS mism
            FROM s LEFT JOIN target t ON s.o_orderkey = t.o_orderkey
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS sampled,
               CAST(SUM(CASE WHEN found_flag THEN 1 ELSE 0 END) AS BIGINT) AS found,
               CAST(SUM(CASE WHEN found_flag THEN 0 ELSE 1 END) AS BIGINT) AS missing,
               CAST(SUM(mism) AS BIGINT) AS mismatched
        FROM j
    """,
    "validation_summary": """
        SELECT 'orders' AS table_name,
               CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS origin_count,
               CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 <> 0)
                    AS BIGINT) AS target_count,
               CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 0)
                    AS BIGINT) AS missing,
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 = 0)
                    AS BIGINT) AS mismatched,
               CAST(0 AS BIGINT) AS extra_in_target,
               'FAIL' AS status
    """,
    "latency_harness": """
        SELECT event_type,
               ROUND(SUM(value), 4) AS total_ms,
               ROUND(AVG(value), 4) AS avg_ms,
               COUNT(*) AS n_requests,
               ROUND(COUNT(*) / ((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1e6),
                     6) AS req_per_sec
        FROM events GROUP BY event_type
    """,
    "continuous_validation_ticks": """
        WITH verdict AS (
            SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS origin_count,
                   CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 <> 0)
                        AS BIGINT) AS target_count,
                   CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 0)
                        AS BIGINT) AS missing,
                   CAST((SELECT COUNT(*) FROM orders
                         WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 = 0)
                        AS BIGINT) AS mismatched,
                   'FAIL' AS status
        )
        SELECT 'tick_0' AS tick, * FROM verdict
        UNION ALL
        SELECT 'tick_1', * FROM verdict
    """,
    "part_type_revenue": """
        SELECT p_type,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type
    """,
    "ttl_expiry": """
        SELECT event_id, epoch_us(ts) AS _writetime,
               CASE WHEN event_id % 10 = 0 THEN NULL
                    ELSE (event_id % 100) * 3600 END AS _ttl
        FROM events
        WHERE event_id % 10 = 0
           OR epoch_us(ts) + (event_id % 100) * 3600 * 1000000
              >= 1706000000000000
    """,
    "null_unset_mask": """
        SELECT o_orderkey,
               (CASE WHEN o_orderkey % 5 = 0 THEN 0 ELSE 1 END
                + CASE WHEN o_orderkey % 3 = 0 THEN 0 ELSE 2 END) AS _set_mask
        FROM orders
    """,
    "custom_transform": """
        SELECT c_custkey, md5(c_name) AS c_name, c_mktsegment FROM customer
    """,
    "read_routing": """
        SELECT * FROM orders WHERE o_totalprice > 450000
    """,
    "uuid_derivation": """
        SELECT c_custkey,
               concat_ws('-', substr(h, 1, 8), substr(h, 9, 4), substr(h, 13, 4),
                         substr(h, 17, 4), substr(h, 21, 12)) AS user_uuid
        FROM (SELECT c_custkey,
                     md5(concat_ws(':', '42', c_custkey::VARCHAR)) AS h
              FROM customer)
    """,
    "observe_progress": """
        SELECT COUNT(*) AS rows_processed,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_rows
        FROM events
    """,
    "stream_dual_write": """
        SELECT event_id, user_id, event_type, value FROM events
    """,
    "stream_windowed_rate": """
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               event_type,
               COUNT(*) AS cnt,
               ROUND(COUNT(*) / 300.0, 6) AS ops_per_sec
        FROM events GROUP BY 1, 2
    """,
    "missing_rows": f"""
        SELECT o.* FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM ({_TARGET_SQL}) t WHERE t.o_orderkey = o.o_orderkey
        )
    """,
    "mismatch_detect": f"""
        SELECT o.o_orderkey
        FROM orders o JOIN ({_TARGET_SQL}) t USING (o_orderkey)
        WHERE o.o_custkey IS DISTINCT FROM t.o_custkey
           OR o.o_orderstatus IS DISTINCT FROM t.o_orderstatus
           OR o.o_totalprice IS DISTINCT FROM t.o_totalprice
           OR o.o_orderdate IS DISTINCT FROM t.o_orderdate
           OR o.o_orderpriority IS DISTINCT FROM t.o_orderpriority
    """,
    "reconcile_rows": f"""
        WITH target AS ({_TARGET_SQL}),
        missing AS (
            SELECT o.* FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = o.o_orderkey)
        ),
        mismatched AS (
            SELECT o.* FROM orders o JOIN target t USING (o_orderkey)
            WHERE o.o_custkey IS DISTINCT FROM t.o_custkey
               OR o.o_orderstatus IS DISTINCT FROM t.o_orderstatus
               OR o.o_totalprice IS DISTINCT FROM t.o_totalprice
               OR o.o_orderdate IS DISTINCT FROM t.o_orderdate
               OR o.o_orderpriority IS DISTINCT FROM t.o_orderpriority
        )
        SELECT * FROM missing UNION ALL SELECT * FROM mismatched
    """,
    "bucket_count_compare": f"""
        WITH target AS ({_TARGET_SQL}),
        o AS (SELECT o_orderkey % 32 AS bucket, COUNT(*) AS origin_cnt
              FROM orders GROUP BY 1),
        t AS (SELECT o_orderkey % 32 AS bucket, COUNT(*) AS target_cnt
              FROM target GROUP BY 1)
        SELECT COALESCE(o.bucket, t.bucket) AS bucket,
               COALESCE(origin_cnt, 0) AS origin_cnt,
               COALESCE(target_cnt, 0) AS target_cnt
        FROM o FULL OUTER JOIN t ON o.bucket = t.bucket
        WHERE COALESCE(origin_cnt, 0) <> COALESCE(target_cnt, 0)
    """,
    "event_sessions": """
        WITH e AS (
            SELECT user_id, event_id, ts,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec
            FROM events
        ),
        f AS (
            SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                             OR sec - lag(sec) OVER w > 28800
                           THEN 1 ELSE 0 END AS is_new
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT *, SUM(is_new) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_id
            FROM f
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               MAX(sec) - MIN(sec) AS duration_s
        FROM s GROUP BY user_id, session_id
    """,
    "repetition_signals": """
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        bg AS (
            SELECT doc_id, unnest(list_transform(
                range(1, greatest(len(toks) - 1, 1) + 1),
                i -> array_to_string(list_slice(toks, i, i + 1), ' ')
            )) AS bigram
            FROM tk
        ),
        cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        agg AS (
            SELECT doc_id, ROUND(MAX(c) * 1.0 / SUM(c), 4) AS top_bigram_frac
            FROM cnt GROUP BY 1
        )
        SELECT t.doc_id,
               ROUND(len(list_distinct(toks))::DOUBLE / len(toks), 4)
                   AS distinct_token_ratio,
               a.top_bigram_frac
        FROM tk t JOIN agg a ON t.doc_id = a.doc_id
    """,
    "decontaminate": f"""
        WITH {_SHINGLES_CTE},
        bench AS (
            SELECT DISTINCT shingle FROM sh
            WHERE {bucket_sql('doc_id', 'bench')} < 1000
        )
        SELECT s.doc_id, COUNT(*) AS n_overlap
        FROM sh s JOIN bench b ON s.shingle = b.shingle
        WHERE {bucket_sql('s.doc_id', 'bench')} >= 1000
        GROUP BY s.doc_id
    """,
    "semantic_dedup": f"""
        WITH cents AS (
            SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_v
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8
        ),
        v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        scored AS (
            SELECT v.vec_id, v.ev, c.c_id,
                   ROUND({_COS_SIM.replace('a_v', 'v.ev').replace('b_v', 'c.c_v')}, 4)
                       AS cos4
            FROM v CROSS JOIN cents c
        ),
        assign AS (
            SELECT vec_id, ev, c_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY cos4 DESC, c_id ASC) AS rn
                FROM scored
            ) WHERE rn = 1
        ),
        dropped AS (
            SELECT DISTINCT b.vec_id
            FROM assign a JOIN assign b
              ON a.cluster = b.cluster AND a.vec_id < b.vec_id
            WHERE ROUND({_COS_SIM.replace('a_v', 'a.ev').replace('b_v', 'b.ev')}, 4) >= 0.45
        )
        SELECT a.vec_id, a.cluster,
               CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
        FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """,
    "tfidf_keywords": """
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        flat AS (
            SELECT doc_id, unnest(toks) AS term, len(toks) AS n_tokens
            FROM tk
        ),
        tfc AS (
            SELECT doc_id, term, any_value(n_tokens) AS n_tokens,
                   COUNT(*) AS tf
            FROM flat GROUP BY 1, 2
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT t.doc_id, t.term,
                   ROUND(t.tf * 1.0 / t.n_tokens
                         * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1), 4)
                       AS tfidf
            FROM tfc t JOIN dfreq d ON t.term = d.term CROSS JOIN n
        )
        SELECT doc_id, term, tfidf FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
    "vocab_oov": """
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        flat AS (
            SELECT doc_id, unnest(toks) AS term, len(toks) AS n_tokens
            FROM tk
        ),
        cnt AS (SELECT term, COUNT(*) AS c FROM flat GROUP BY 1),
        vocab AS (SELECT term FROM cnt ORDER BY c DESC, term ASC LIMIT 20)
        SELECT f.doc_id, any_value(f.n_tokens) AS n_tokens,
               CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov,
               ROUND(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)::DOUBLE
                     / any_value(f.n_tokens), 4) AS oov_frac
        FROM flat f LEFT JOIN vocab v ON f.term = v.term
        GROUP BY f.doc_id
    """,
    "pack_sequences": """
        WITH t AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        )
        SELECT doc_id, source, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // 512 AS BIGINT) AS bin_id
        FROM t
    """,
    "incremental_dedup": f"""
        WITH keyed AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                       AS fp,
                   {bucket_sql('doc_id', 'seen')} AS b
            FROM documents
        ),
        seen AS (SELECT DISTINCT fp FROM keyed WHERE b < 5000),
        fresh AS (
            SELECT doc_id, fp FROM keyed
            WHERE b >= 5000 AND fp NOT IN (SELECT fp FROM seen)
        )
        SELECT MIN(doc_id) AS doc_id, fp AS fingerprint
        FROM fresh GROUP BY fp
    """,
    "quantized_topk": f"""
        WITH v AS (
            SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
        ),
        m AS (
            SELECT vec_id, ev,
                   list_max(list_transform(ev, x -> abs(x))) AS mx
            FROM v
        ),
        q8 AS (
            SELECT vec_id,
                   CASE WHEN mx = 0 THEN list_transform(ev, x -> 0.0)
                        ELSE list_transform(ev, x -> round(x * 127.0 / mx))
                   END AS qv
            FROM m
        ),
        q AS (SELECT qv AS a_v FROM q8 WHERE vec_id = 0),
        scored AS (
            SELECT b.vec_id,
                   ROUND({_COS_SIM.replace('b_v', 'b.qv')}, 4) AS cos_sim_q8
            FROM q8 b, q WHERE b.vec_id <> 0
        )
        SELECT vec_id, cos_sim_q8 FROM scored
        ORDER BY cos_sim_q8 DESC, vec_id LIMIT 10
    """,
    "url_parse": f"""
        WITH u AS ({_URL_CTE})
        SELECT doc_id, 'https' AS protocol,
               'www.' || sitedom AS host,
               sitedom AS domain,
               '/' || lang || '/' || CAST(doc_id % 37 AS VARCHAR)
                   || '/doc-' || CAST(doc_id AS VARCHAR) || '.html' AS path,
               'ref=r' || CAST(doc_id % 5 AS VARCHAR) AS query_string
        FROM u
    """,
    "blocklist_filter": f"""
        WITH u AS ({_URL_CTE}),
        urls AS (
            SELECT doc_id, sitedom,
                   'https://www.' || sitedom || '/' || lang || '/' ||
                   CAST(doc_id % 37 AS VARCHAR) || '/doc-' ||
                   CAST(doc_id AS VARCHAR) || '.html?ref=r' ||
                   CAST(doc_id % 5 AS VARCHAR) AS url
            FROM u
        )
        SELECT doc_id, url FROM urls
        WHERE NOT (sitedom IN ('src3-site.com', 'src7-site.org')
                   OR sitedom LIKE '%.net')
          AND NOT regexp_matches(url, 'ref=r4$')
    """,
    "psi_drift": """
        WITH a AS (
            SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS INT),
                                  0), 9) AS bucket
            FROM events
        ),
        b AS (
            SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS INT),
                                  0), 9) AS bucket
            FROM events WHERE user_id % 3 = 0
        ),
        ca AS (SELECT bucket, COUNT(*) AS n_a FROM a GROUP BY 1),
        cb AS (SELECT bucket, COUNT(*) AS n_b FROM b GROUP BY 1),
        spine AS (SELECT CAST(g AS INT) AS bucket
                  FROM generate_series(0, 9) t(g)),
        j AS (
            SELECT s.bucket, COALESCE(n_a, 0) AS n_a,
                   COALESCE(n_b, 0) AS n_b
            FROM spine s LEFT JOIN ca USING (bucket)
                         LEFT JOIN cb USING (bucket)
        ),
        t AS (
            SELECT *,
                   (n_a + 1) / (SUM(n_a) OVER () + 10.0) AS p,
                   (n_b + 1) / (SUM(n_b) OVER () + 10.0) AS q
            FROM j
        )
        SELECT bucket, CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               ROUND(p, 6) AS share_a, ROUND(q, 6) AS share_b,
               ROUND((p - q) * ln(p / q), 6) AS psi_term
        FROM t
    """,
    "domain_stats": f"""
        WITH u AS ({_URL_CTE})
        SELECT sitedom AS domain,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ROUND(AVG(n_chars), 2) AS avg_chars,
               COUNT(DISTINCT lang) AS n_langs
        FROM u GROUP BY sitedom
    """,
    "domain_quota": f"""
        WITH u AS ({_URL_CTE}),
        ranked AS (
            SELECT sitedom AS domain, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY sitedom
                       ORDER BY {_md5_draw_sql('quota', 'doc_id')}, doc_id
                   ) AS quota_rank
            FROM u
        )
        SELECT domain, doc_id, quota_rank FROM ranked WHERE quota_rank <= 5
    """,
    "bloom_membership": _bloom_membership_oracle(),
    "throttle_schedule": f"""
        WITH sched AS (
            SELECT ({_md5_draw_sql('throttle:w', 'o_orderkey')} % 4) AS worker,
                   ROW_NUMBER() OVER (
                       PARTITION BY ({_md5_draw_sql('throttle:w', 'o_orderkey')} % 4)
                       ORDER BY {_md5_draw_sql('throttle:o', 'o_orderkey')}, o_orderkey
                   ) - 1 AS rank0
            FROM orders
        )
        SELECT rank0 // 500 AS send_second,
               COUNT(*) AS rows_sent,
               COUNT(DISTINCT worker) AS n_workers
        FROM sched GROUP BY 1
    """,
    "pq_codes": f"""
        WITH {_PQ_CTES}
        SELECT vec_id, j, code FROM codes
    """,
    "pq_adc_topk": f"""
        WITH {_PQ_CTES},
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
            FROM codes c JOIN lut l ON l.j = c.j AND l.cid = c.code
            WHERE c.vec_id <> 0
            GROUP BY c.vec_id
        )
        SELECT vec_id, adc_score_e4 FROM scored
        ORDER BY adc_score_e4 DESC, vec_id LIMIT 10
    """,
    "asof_last_click": """
        SELECT e.event_id,
               e.user_id,
               c.event_id AS click_event_id,
               c.value AS click_value,
               CASE WHEN c.ts IS NULL THEN NULL
                    ELSE epoch_us(e.ts) - epoch_us(c.ts) END AS gap_us
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN
             (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click') c
        ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    "stratified_sample": _stratified_sample_oracle(),
    "chunk_dedup": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        c AS (
            SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / 32.0) AS INT))) AS chunk_id
            FROM t
        ),
        ch AS (
            SELECT doc_id,
                   md5(array_to_string(
                       list_slice(toks, chunk_id*32 + 1, chunk_id*32 + 32), ' '
                   )) AS h
            FROM c
        ),
        freq AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM ch GROUP BY h)
        SELECT ch.doc_id,
               COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN freq.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_chunks,
               ROUND(SUM(CASE WHEN freq.n_docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
                     / COUNT(*), 4) AS dup_frac
        FROM ch JOIN freq USING (h)
        GROUP BY ch.doc_id
    """,
    "orc_roundtrip": """
        SELECT s_nationkey,
               COUNT(*) AS n_suppliers,
               ROUND(SUM(s_acctbal), 2) AS sum_acctbal
        FROM supplier GROUP BY s_nationkey
    """,
    "table_stats": """
        SELECT COUNT(*) AS row_count,
               MIN(l_orderkey) AS l_orderkey_min,
               MAX(l_orderkey) AS l_orderkey_max,
               MIN(l_extendedprice) AS l_extendedprice_min,
               MAX(l_extendedprice) AS l_extendedprice_max
        FROM lineitem
    """,
    "partitioned_events": """
        SELECT user_id, COUNT(*) AS n_clicks,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 4) AS DOUBLE)
                   AS click_value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id
    """,
    "kmeans_clusters": _kmeans_oracle(),
    "interval_session_lookup": """
        WITH e AS (
            SELECT user_id, event_id, ts,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec
            FROM events WHERE event_type <> 'error'
        ),
        f AS (
            SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                             OR sec - lag(sec) OVER w > 28800
                           THEN 1 ELSE 0 END AS is_new
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT *, SUM(is_new) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_id
            FROM f
        ),
        sess AS (
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   MIN(ts) AS session_start, MAX(ts) AS session_end
            FROM s GROUP BY user_id, session_id
        )
        SELECT err.event_id, err.user_id,
               sess.session_id AS session_id,
               sess.n_events AS session_n_events
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error') err
        LEFT JOIN sess
          ON err.user_id = sess.user_id
         AND err.ts >= sess.session_start AND err.ts <= sess.session_end
    """,
    "pivot_lang_source": """
        SELECT source,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
               CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh,
               CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
               CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
               CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr
        FROM documents GROUP BY source
    """,
    "length_quartiles": """
        WITH tiled AS (
            SELECT n_chars,
                   NTILE(4) OVER (ORDER BY n_chars, doc_id) AS tile
            FROM documents
        )
        SELECT tile, COUNT(*) AS n_docs,
               MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        FROM tiled GROUP BY tile
    """,
    "rollup_profile": """
        SELECT lang, source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(GROUPING(lang, source) AS BIGINT) AS gid
        FROM documents GROUP BY ROLLUP (lang, source)
    """,
    "running_total": """
        SELECT o_custkey, o_orderkey,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING
               ) AS DOUBLE), 2) AS running_total
        FROM orders WHERE o_custkey < 100
    """,
    # e6 fixed-point per-term scores (exact integer doc sums); the
    # float constants 2.2/1.2/0.25/0.75 are the exact doubles the
    # Spark side uses (1.2 + 1.0 == 2.2 bit-exactly)
    "bm25_topk": """
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(toks)) AS BIGINT) AS tot_len
            FROM tk
        ),
        flat AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                   unnest(toks) AS term
            FROM tk
        ),
        tf AS (
            SELECT doc_id, term, any_value(n_tokens) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS tf
            FROM flat
            WHERE term IN ('spark', 'join', 'window', 'vector')
            GROUP BY 1, 2
        ),
        dfreq AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ),
        scored AS (
            SELECT t.doc_id,
                   CAST(round(
                       1000000.0
                       * ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                       * (t.tf * 2.2)
                       / (t.tf + 1.2 * (0.25 + 0.75 * (t.n_tokens
                            / (s.tot_len * 1.0 / s.n_docs))))
                   ) AS BIGINT) AS term_score_e6
            FROM tf t JOIN dfreq d USING (term), stats s
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_query_terms,
               CAST(SUM(term_score_e6) AS BIGINT) AS score_e6,
               ROUND(SUM(term_score_e6) * 1.0 / 1000000.0, 4) AS score
        FROM scored GROUP BY doc_id
        ORDER BY score_e6 DESC, doc_id ASC LIMIT 10
    """,
    "unigram_logprob": """
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        flat AS (SELECT doc_id, unnest(toks) AS term FROM tk),
        cnt AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM flat GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM cnt),
        vocab AS (SELECT term, c FROM cnt ORDER BY c DESC, term ASC LIMIT 50),
        vn AS (SELECT CAST(COUNT(*) AS INT) AS v FROM vocab),
        lp AS (
            SELECT f.doc_id,
                   CAST(round(1000000.0 * ln(
                       (COALESCE(vo.c, 0) + 1.0) / (t.tot + n.v + 1.0)
                   )) AS BIGINT) AS lp_e6
            FROM flat f LEFT JOIN vocab vo USING (term), tot t, vn n
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(lp_e6) AS BIGINT) AS logprob_e6,
               ROUND(SUM(lp_e6) * 1.0 / COUNT(*) / 1000000.0, 4)
                   AS avg_logprob
        FROM lp GROUP BY doc_id
    """,
    "dsir_select": """
        WITH tk AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
        ),
        flat AS (SELECT doc_id, lang, unnest(toks) AS term FROM tk),
        fb AS (
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
                   CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 64 AS b
            FROM flat
        ),
        cnt AS (
            SELECT b, CAST(COUNT(*) AS BIGINT) AS c_raw,
                   CAST(SUM(is_t) AS BIGINT) AS c_tgt
            FROM fb GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(c_raw) AS BIGINT) AS t_raw,
                   CAST(SUM(c_tgt) AS BIGINT) AS t_tgt
            FROM cnt
        ),
        lr AS (
            SELECT b,
                   CAST(round(1000000.0 * (
                       ln((c_tgt + 1.0) / (t.t_tgt + 64.0))
                     - ln((c_raw + 1.0) / (t.t_raw + 64.0)))) AS BIGINT) AS lr_e6
            FROM cnt, tot t
        ),
        sc AS (
            SELECT fb.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(lr.lr_e6) AS BIGINT) AS weight_e6
            FROM fb JOIN lr USING (b) GROUP BY 1
        )
        SELECT doc_id, n_tokens, weight_e6,
               ROUND(weight_e6 * 1.0 / 1000000.0, 4) AS weight
        FROM sc ORDER BY weight_e6 DESC, doc_id ASC LIMIT 100
    """,
    "perplexity_buckets": """
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        flat AS (SELECT doc_id, unnest(toks) AS term FROM tk),
        cnt AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM flat GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM cnt),
        vocab AS (SELECT term, c FROM cnt ORDER BY c DESC, term ASC LIMIT 50),
        vn AS (SELECT CAST(COUNT(*) AS INT) AS v FROM vocab),
        lp AS (
            SELECT f.doc_id,
                   CAST(round(1000000.0 * ln(
                       (COALESCE(vo.c, 0) + 1.0) / (t.tot + n.v + 1.0)
                   )) AS BIGINT) AS lp_e6
            FROM flat f LEFT JOIN vocab vo USING (term), tot t, vn n
        ),
        sc AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(lp_e6) AS BIGINT) AS logprob_e6
            FROM lp GROUP BY doc_id
        ),
        tiled AS (
            SELECT s.doc_id, d.lang,
                   s.logprob_e6 * 1.0 / s.n_tokens AS avg_key,
                   NTILE(3) OVER (
                       PARTITION BY d.lang
                       ORDER BY s.logprob_e6 * 1.0 / s.n_tokens DESC,
                                s.doc_id ASC) AS tile
            FROM sc s JOIN documents d USING (doc_id)
        )
        SELECT doc_id, lang,
               ROUND(avg_key / 1000000.0, 4) AS avg_logprob,
               CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                         ELSE 'tail' END AS ppl_bucket
        FROM tiled
    """,
    "strip_boilerplate": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        c AS (
            SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / 8.0) AS INT)))
                       AS chunk_id
            FROM t
        ),
        ch AS (
            SELECT doc_id, chunk_id,
                   array_to_string(
                       list_slice(toks, CAST(chunk_id * 8 + 1 AS INT),
                                  CAST(chunk_id * 8 + 8 AS INT)), ' ')
                       AS chunk_text
            FROM c
        ),
        freq AS (
            SELECT chunk_text, COUNT(DISTINCT doc_id) AS nd
            FROM ch GROUP BY 1
        ),
        marked AS (
            SELECT ch.doc_id, ch.chunk_id, ch.chunk_text,
                   (f.nd > 1) AS dropped
            FROM ch JOIN freq f USING (chunk_text)
        )
        SELECT doc_id,
               COALESCE(string_agg(
                   CASE WHEN NOT dropped THEN chunk_text END,
                   ' ' ORDER BY chunk_id), '') AS cleaned_text,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped
        FROM marked GROUP BY doc_id
    """,
    "dup_ngram_fraction": """
        WITH sh AS (
            SELECT doc_id,
                   list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                       i -> array_to_string(list_slice(string_split(text, ' '),
                                                       CAST(i AS INT),
                                                       CAST(i AS INT) + 2), ' ')
                   ) AS g
            FROM documents
        )
        SELECT doc_id,
               CAST(len(g) AS BIGINT) AS n_ngrams,
               ROUND((len(g) - len(list_distinct(g))) * 1.0 / len(g), 4)
                   AS dup_ngram_frac
        FROM sh
    """,
    "zipf_head_coverage": """
        WITH flat AS (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents
        ),
        cnt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM flat GROUP BY 1),
        tot AS (
            SELECT CAST(SUM(c) AS BIGINT) AS total_tokens,
                   CAST(COUNT(*) AS BIGINT) AS distinct_terms
            FROM cnt
        ),
        head AS (
            SELECT CAST(SUM(c) AS BIGINT) AS h
            FROM (SELECT c FROM cnt ORDER BY c DESC, t ASC LIMIT 100)
        )
        SELECT tot.total_tokens, tot.distinct_terms,
               ROUND(head.h * 1.0 / tot.total_tokens, 4) AS head_coverage
        FROM tot, head
    """,
    "winnow_fingerprints": """
        WITH g AS (
            SELECT doc_id, text, len(text) - 4 AS ng FROM documents
        ),
        h AS (
            SELECT doc_id,
                   list_transform(range(1, ng + 1),
                       i -> CAST('0x' || substr(md5(substr(text, CAST(i AS INT), 5)), 1, 8)
                                AS BIGINT)) AS hs
            FROM g WHERE ng >= 1
        ),
        w AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(hs) - 2),
                       j -> list_min(list_slice(hs, CAST(j AS INT),
                                                CAST(j AS INT) + 3)))) AS fps
            FROM h WHERE len(hs) >= 4
        )
        SELECT doc_id, unnest(fps) AS fp FROM w
    """,
    "bigram_logprob": """
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        tk2 AS (SELECT * FROM tk WHERE len(toks) >= 2),
        idx AS (
            SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tk2
        ),
        bi AS (
            SELECT doc_id, toks[i] AS ctx, toks[i] || ' ' || toks[i + 1] AS bg
            FROM idx
        ),
        bcnt AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c FROM bi GROUP BY 1),
        bvocab AS (SELECT bg, c FROM bcnt ORDER BY c DESC, bg ASC LIMIT 200),
        bv AS (SELECT CAST(COUNT(*) AS INT) AS v FROM bvocab),
        ucnt AS (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest(toks) AS t FROM tk2) GROUP BY 1
        ),
        uvocab AS (SELECT t, c FROM ucnt ORDER BY c DESC, t ASC LIMIT 200),
        lp AS (
            SELECT bi.doc_id,
                   CAST(round(1000000.0 * ln(
                       (COALESCE(b.c, 0) + 1.0)
                       / (COALESCE(u.c, 0) + n.v + 1.0)
                   )) AS BIGINT) AS lp_e6
            FROM bi
            LEFT JOIN bvocab b USING (bg)
            LEFT JOIN uvocab u ON u.t = bi.ctx, bv n
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(lp_e6) AS BIGINT) AS logprob_e6,
               ROUND(SUM(lp_e6) * 1.0 / COUNT(*) / 1000000.0, 4)
                   AS avg_logprob
        FROM lp GROUP BY doc_id
    """,
    "fuzzy_part_match": """
        WITH names AS (
            SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS n,
                   string_split(p_name, ' ')[-1] AS blk
            FROM part GROUP BY p_name
        )
        SELECT a.nm AS name_a, b.nm AS name_b,
               levenshtein(a.nm, b.nm) AS dist,
               a.n AS n_a, b.n AS n_b
        FROM names a JOIN names b ON a.blk = b.blk AND a.nm < b.nm
        WHERE abs(len(a.nm) - len(b.nm)) <= 2
          AND levenshtein(a.nm, b.nm) <= 2
    """,
    "resample_ffill": """
        WITH e AS (
            SELECT user_id, date_trunc('hour', ts) AS h, value
            FROM events WHERE event_type = 'purchase'
        ),
        b AS (
            SELECT user_id, h, CAST(COUNT(*) AS BIGINT) AS c,
                   MAX(value) AS mv
            FROM e GROUP BY 1, 2
        ),
        span AS (
            SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM e GROUP BY 1
        ),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket
            FROM span
        )
        SELECT g.user_id, g.bucket,
               COALESCE(b.c, 0) AS n_events,
               last_value(b.mv IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_ffill
        FROM grid g LEFT JOIN b ON b.user_id = g.user_id AND b.h = g.bucket
    """,
    "event_funnel": """
        WITH u AS (
            SELECT user_id,
                   MIN(ts) FILTER (WHERE event_type = 'view') AS t0,
                   MIN(ts) FILTER (WHERE event_type = 'click') AS t1,
                   MIN(ts) FILTER (WHERE event_type = 'purchase') AS t2
            FROM events GROUP BY 1
        ),
        c AS (
            SELECT
                CAST(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS c0,
                CAST(SUM(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL
                              AND t0 < t1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS c1,
                CAST(SUM(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL
                              AND t0 < t1 AND t2 IS NOT NULL AND t1 < t2
                              THEN 1 ELSE 0 END)
                     AS BIGINT) AS c2
            FROM u
        )
        SELECT 0 AS stage_index, 'view' AS stage, c0 AS users,
               CAST(NULL AS DOUBLE) AS conversion FROM c
        UNION ALL
        SELECT 1, 'click', c1, ROUND(c1 * 1.0 / c0, 4) FROM c
        UNION ALL
        SELECT 2, 'purchase', c2, ROUND(c2 * 1.0 / c1, 4) FROM c
    """,
    "hybrid_rrf": f"""
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(toks)) AS BIGINT) AS tot_len
            FROM tk
        ),
        flat AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                   unnest(toks) AS term
            FROM tk
        ),
        tf AS (
            SELECT doc_id, term, any_value(n_tokens) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS tf
            FROM flat
            WHERE term IN ('spark', 'join', 'window', 'vector')
            GROUP BY 1, 2
        ),
        dfreq AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ),
        bmscored AS (
            SELECT t.doc_id,
                   CAST(round(
                       1000000.0
                       * ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                       * (t.tf * 2.2)
                       / (t.tf + 1.2 * (0.25 + 0.75 * (t.n_tokens
                            / (s.tot_len * 1.0 / s.n_docs))))
                   ) AS BIGINT) AS term_score_e6
            FROM tf t JOIN dfreq d USING (term), stats s
        ),
        bm AS (
            SELECT doc_id, CAST(SUM(term_score_e6) AS BIGINT) AS score_e6
            FROM bmscored GROUP BY doc_id
            ORDER BY score_e6 DESC, doc_id LIMIT 50
        ),
        bmr AS (
            SELECT doc_id, ROW_NUMBER() OVER (
                ORDER BY score_e6 DESC, doc_id) AS r
            FROM bm
        ),
        q AS (
            SELECT embedding::DOUBLE[] AS a_v FROM embeddings WHERE vec_id = 0
        ),
        cosd AS (
            SELECT b.vec_id AS doc_id,
                   ROUND({_COS_SIM.replace('b_v', 'b.embedding::DOUBLE[]')}, 4)
                       AS cos_sim
            FROM embeddings b, q WHERE b.vec_id <> 0
        ),
        cost AS (
            SELECT doc_id, cos_sim FROM cosd
            ORDER BY cos_sim DESC, doc_id LIMIT 50
        ),
        cosr AS (
            SELECT doc_id, ROW_NUMBER() OVER (
                ORDER BY cos_sim DESC, doc_id) AS r
            FROM cost
        ),
        u AS (
            SELECT doc_id, CAST(round(1000000000.0 / (60 + r)) AS BIGINT) AS c
            FROM bmr
            UNION ALL
            SELECT doc_id, CAST(round(1000000000.0 / (60 + r)) AS BIGINT) AS c
            FROM cosr
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
               CAST(SUM(c) AS BIGINT) AS rrf_e9,
               ROUND(SUM(c) / 1000000000.0, 6) AS rrf_score
        FROM u GROUP BY doc_id
        ORDER BY rrf_e9 DESC, doc_id LIMIT 15
    """,
    "url_canonical_groups": f"""
        WITH u AS ({_URL_CTE}),
        c AS (
            SELECT 'https://' || sitedom || '/' || lang || '/'
                       || CAST(doc_id % 37 AS VARCHAR) || '/' AS canonical_url,
                   doc_id
            FROM u
        )
        SELECT canonical_url,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
        FROM c GROUP BY canonical_url
    """,
    "hashed_quality_clf": f"""
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        s AS (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(list_sum(list_transform(toks,
                       t -> {_md5_draw_sql('quality-clf', 't')} % 2001 - 1000
                   )) AS BIGINT) AS w_sum_e3
            FROM tk
        ),
        p AS (
            SELECT doc_id, n_tokens, w_sum_e3,
                   ROUND(1.0 / (1.0 + exp(-(w_sum_e3 / (1000.0 * n_tokens)))),
                         4) AS quality_prob
            FROM s
        )
        SELECT doc_id, n_tokens, w_sum_e3, quality_prob,
               quality_prob >= 0.5 AS accept
        FROM p
    """,
    "token_budget_select": """
        WITH t AS (
            SELECT doc_id, n_chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, n_chars, n_tokens,
                   SUM(n_tokens) OVER (
                       ORDER BY n_chars DESC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum
            FROM t
        )
        SELECT doc_id, n_chars, n_tokens FROM c WHERE cum <= 10000
    """,
    "heavy_hitters": """
        SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY term HAVING COUNT(*) >= 300
    """,
    "stable_dense_ids": """
        SELECT doc_id, n_chars,
               CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC)
                    AS BIGINT) AS stable_id
        FROM documents
    """,
    "scd2_history": """
        WITH c AS (
            SELECT user_id, ts, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_type
                   ) AS prev
            FROM events
        ),
        f AS (
            SELECT user_id, ts, event_type FROM c
            WHERE prev IS NULL OR prev <> event_type
        )
        SELECT user_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_type
               ) AS BIGINT) AS version,
               event_type,
               ts AS valid_from,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_type
               ) AS valid_to
        FROM f
    """,
    "percentile_normalize": """
        SELECT doc_id, lang, n_chars,
               ROUND(percent_rank() OVER (
                   PARTITION BY lang ORDER BY n_chars ASC
               ), 6) AS pct_rank
        FROM documents
    """,
    "robust_scale": """
        WITH med AS (
            -- quantile_cont = Spark's interpolated median (DuckDB's
            -- median() is the discrete lower-middle variant)
            SELECT lang,
                   CAST(quantile_cont(n_chars * 1.0, 0.5) AS DOUBLE) AS m
            FROM documents GROUP BY lang
        ),
        mad AS (
            SELECT d.lang,
                   CAST(quantile_cont(abs(d.n_chars * 1.0 - med.m), 0.5)
                        AS DOUBLE) AS s
            FROM documents d JOIN med USING (lang) GROUP BY d.lang
        )
        SELECT d.doc_id, d.lang, d.n_chars,
               ROUND(med.m, 4) AS group_median,
               ROUND(mad.s, 4) AS group_mad,
               CASE WHEN mad.s <> 0
                    THEN ROUND((d.n_chars * 1.0 - med.m) / mad.s, 4)
               END AS robust_z
        FROM documents d JOIN med USING (lang) JOIN mad USING (lang)
    """,
    "domain_pagerank": _pagerank_oracle(5),
    "bucketed_join": """
        SELECT o_orderstatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty,
               COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
    "dedup_survivors": f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE ROUND(i * 1.0 / (sa.sz + sb.sz - i), 4) >= 0.5
        ),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
        ),
        comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
        sized AS (
            SELECT doc_id, component,
                   COUNT(*) OVER (PARTITION BY component) AS cluster_size
            FROM comp
        ),
        {_QUALITY_CTE},
        ranked AS (
            SELECT s.doc_id, s.cluster_size, q.quality_e4,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.component
                       ORDER BY q.quality_e4 DESC, s.doc_id
                   ) AS rn
            FROM sized s JOIN q USING (doc_id)
        )
        SELECT doc_id, cluster_size, quality_e4 FROM ranked WHERE rn = 1
    """,
    "ngram_novelty": f"""
        WITH {_SHINGLES_CTE},
        dfq AS (SELECT shingle, COUNT(*) AS dfreq FROM sh GROUP BY shingle)
        SELECT doc_id,
               COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN dfreq = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique,
               ROUND(SUM(CASE WHEN dfreq = 1 THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*), 4) AS novelty
        FROM sh JOIN dfq USING (shingle)
        GROUP BY doc_id
    """,
    "zorder_keys": None,  # filled below (needs the generated bit expr)
    "stream_enrich": """
        SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    "source_overlap": """
        WITH fp AS (
            SELECT DISTINCT source AS src,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
            FROM documents
        )
        SELECT a.src AS source_a, b.src AS source_b,
               COUNT(*) AS shared_fps
        FROM fp a JOIN fp b ON a.f = b.f AND a.src < b.src
        GROUP BY 1, 2
    """,
})

from cassandra_data_migration_spark.operators.linalg import (  # noqa: E402
    gram_matrix_sql as _gram_matrix_sql,
)



register_queries(globals())
__all__ = export_all(globals())
