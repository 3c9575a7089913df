"""Extended oracle registrations, continued (stream pacing, file
round-trips, sketches, graph, retrieval, and the families through the
end of the former part07).

Second half of the round-9 split of part07_oracles_extended (it had
grown past 2,000 lines); registrations continue here unchanged, so
the gate registry is byte-identical.  The part chain (star-import of
the previous part) preserves the original single-namespace evaluation
order.
"""
from __future__ import annotations

from cdm_entry.part07_oracles_extended import *  # noqa: F401,F403

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
