"""BPE oracle machinery: pure-Python reference trainer and the fixture-dependent vocab/pack oracles.

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry.part07b_oracles_extended2 import *  # noqa: F401,F403

_BPE_ORACLE_CACHE: dict[str, str] = {}


_BPE_MERGE_CACHE: dict[str, list[tuple[str, str]]] = {}


def _learned_bpe_merges(sf_dir: str) -> list[tuple[str, str]]:
    """Learn the 8-merge sequence over the fixture corpus with the
    pure-Python reference (identical tie-breaks to the Spark trainer,
    pinned by tests) — shared by the bpe_vocab and bpe_pack_pipeline
    oracles."""
    if sf_dir not in _BPE_MERGE_CACHE:
        import duckdb as _duckdb

        wc = _duckdb.sql(
            f"""
            SELECT word, COUNT(*) AS n FROM (
                SELECT unnest(string_split(trim(regexp_replace(lower(text),
                    '\\s+', ' ', 'g')), ' ')) AS word
                FROM '{sf_dir}/documents.parquet'
            ) WHERE word <> '' GROUP BY 1
            """
        ).fetchall()
        _BPE_MERGE_CACHE[sf_dir] = _py_bpe_learn(
            [(w, n) for w, n in wc], 8
        )
    return _BPE_MERGE_CACHE[sf_dir]


def _bpe_pack_oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Oracle for ``bpe_pack_pipeline``: replay the learned merges with
    word retained through the rounds, price each document in learned
    tokens, pack into per-source 256-token bins with the identical
    exclusive-cumsum arithmetic."""
    merges = _learned_bpe_merges(sf_dir)
    enc = lambda sym: f"chr(2) || '{sym}' || chr(3)"  # noqa: E731
    rounds = ""
    prev = "enc"
    for i, (a, b) in enumerate(merges):
        rounds += (
            f", p{i} AS (SELECT word, replace(s, {enc(a)} || ' ' || {enc(b)},"
            f" {enc(a + b)}) AS s FROM {prev})"
        )
        prev = f"p{i}"
    return f"""
        WITH words AS (
            SELECT DISTINCT word FROM (
                SELECT unnest(string_split(trim(regexp_replace(lower(text),
                    '\\s+', ' ', 'g')), ' ')) AS word
                FROM documents
            ) WHERE word <> ''
        ),
        enc AS (
            SELECT word,
                   array_to_string(list_transform(range(1, length(word) + 1),
                       i -> chr(2) || substr(word, CAST(i AS INT), 1) || chr(3)),
                       ' ') || ' ' || chr(2) || '</w>' || chr(3) AS s
            FROM words
        ){rounds},
        wlen AS (
            SELECT word, len(string_split(s, ' ')) AS w_tokens FROM {prev}
        ),
        docw AS (
            SELECT doc_id, source,
                   unnest(string_split(trim(regexp_replace(lower(text),
                       '\\s+', ' ', 'g')), ' ')) AS word
            FROM documents
        ),
        perdoc AS (
            SELECT d.doc_id, ANY_VALUE(d.source) AS source,
                   CAST(SUM(w.w_tokens) AS BIGINT) AS bpe_tokens
            FROM docw d JOIN wlen w USING (word)
            WHERE d.word <> ''
            GROUP BY d.doc_id
        )
        SELECT doc_id, source, bpe_tokens,
               CAST(COALESCE(SUM(bpe_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // 256 AS BIGINT) AS bin_id
        FROM perdoc
    """


def _py_bpe_learn(wc: list[tuple[str, int]], num_merges: int):
    """Pure-Python reference BPE (the classic Sennrich formulation) —
    learns the merge sequence the oracle SQL then applies.  Tie-break
    (count DESC, pair ASC) matches the Spark trainer exactly."""
    vocab: dict[tuple, int] = {}
    for w, n in wc:
        vocab[tuple(list(w) + ["</w>"])] = vocab.get(tuple(list(w) + ["</w>"]), 0) + n
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple, int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new: dict[tuple, int] = {}
        for syms, n in vocab.items():
            out, pend = [], None
            for x in syms:
                if pend == a and x == b:
                    out.append(a + b)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            t = tuple(out)
            new[t] = new.get(t, 0) + n
        vocab = new
    return merges


def _bpe_oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Oracle for ``bpe_vocab``: learn the merges with the pure-Python
    reference over the same word counts (read via DuckDB), then emit
    SQL that applies them as sentinel-delimited string replaces
    (plain replace() is leftmost non-overlapping — identical
    semantics to the Spark-side fold) and aggregates the vocabulary.
    Built lazily because it reads the fixture at oracle time."""
    if sf_dir in _BPE_ORACLE_CACHE:
        return _BPE_ORACLE_CACHE[sf_dir]
    merges = _learned_bpe_merges(sf_dir)
    enc = lambda sym: f"chr(2) || '{sym}' || chr(3)"  # noqa: E731
    rounds = ""
    prev = "enc"
    for i, (a, b) in enumerate(merges):
        rounds += (
            f", m{i} AS (SELECT n, replace(s, {enc(a)} || ' ' || {enc(b)},"
            f" {enc(a + b)}) AS s FROM {prev})"
        )
        prev = f"m{i}"
    sql = f"""
        WITH words AS (
            SELECT word, COUNT(*) AS n FROM (
                SELECT unnest(string_split(trim(regexp_replace(lower(text),
                    '\\s+', ' ', 'g')), ' ')) AS word
                FROM documents
            ) WHERE word <> '' GROUP BY 1
        ),
        enc AS (
            SELECT n,
                   array_to_string(list_transform(range(1, length(word) + 1),
                       i -> chr(2) || substr(word, CAST(i AS INT), 1) || chr(3)),
                       ' ') || ' ' || chr(2) || '</w>' || chr(3) AS s
            FROM words
        ){rounds}
        SELECT replace(replace(symbol, chr(2), ''), chr(3), '') AS symbol,
               COUNT(*) AS n_words, CAST(SUM(n) AS BIGINT) AS occurrences
        FROM (
            SELECT n, unnest(string_split(s, ' ')) AS symbol FROM {prev}
        ) GROUP BY 1
    """
    _BPE_ORACLE_CACHE[sf_dir] = sql
    return sql




register_queries(globals())
__all__ = export_all(globals())
