"""Main oracle registrations, continued (text/tokenizer, quantization,
URL/quality, and the families through the end of the former part06).

Second half of the round-9 split of part06_oracles_main (it had grown
past 1,800 lines); the ``ORACLES.update({...})`` literal continues
here unchanged, so the gate registry is byte-identical.  The part
chain (star-import of the previous part) preserves the original
single-namespace evaluation order.
"""
from __future__ import annotations

from cdm_entry.part06_oracles_main import *  # noqa: F401,F403

ORACLES.update({
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
