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
})


register_queries(globals())
__all__ = export_all(globals())
