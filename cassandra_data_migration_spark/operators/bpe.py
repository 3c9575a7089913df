"""BPE tokenizer training on a corpus — byte-pair encoding merge
learning (Sennrich et al. 2016, public algorithm) as a Spark plan.

A real training-data pipeline doesn't just COUNT tokens
(text.token_count); it learns the tokenizer from the corpus.  BPE
training is inherently iterative — each round merges the most
frequent adjacent symbol pair — which makes it the same
driver-orchestrated-loop shape as ``similarity.kmeans_fit`` and
``graph.pagerank``: per round, ONE distributed aggregation produces a
tiny statistic (the argmax pair), and the driver folds it into the
next round's plan.

Scale design
------------
- The corpus collapses to a (word, count) table FIRST — one groupBy
  over exploded tokens.  All merge rounds run on distinct words
  (Heaps' law: ~10⁵-10⁶ rows even for a 100 TB corpus), so the
  expensive corpus scan happens exactly once.
- Each round: explode adjacent pairs weighted by word count →
  map-combined groupBy over pair keys → ``orderBy().limit(1)``
  (TakeOrdered — no global sort) → the winning pair becomes a literal
  in the next round's merge expression.  The shuffle carries pair
  partial counts, never words.
- The merge itself is a scan-side ``aggregate`` fold over each word's
  symbol array (words are short, so the per-element lambda cost is
  bounded); no UDF, no Python in the hot path.
- Ties break deterministically: (count DESC, pair ASC) — any engine
  and the pure-Python reference implementation (tests) learn the
  IDENTICAL merge sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.text import normalize_text

END = "</w>"  # end-of-word marker, per the original BPE formulation


def word_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n) over the normalized corpus — the one corpus-wide
    pass; everything after runs on distinct words."""
    toks = F.split(normalize_text(text_col), " ")
    return (
        df.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """character symbols + end-of-word marker."""
    return F.concat(
        F.split(word, ""),
        F.array(F.lit(END)),
    )


def _merge_pair(symbols: Column, a: str, b: str) -> Column:
    """Fold the symbol array left-to-right, merging every
    non-overlapping adjacent (a, b) into the single symbol a||b —
    the BPE apply step as one ``aggregate`` expression.

    State: (out: array<string>, pending: last unmerged symbol or
    NULL).  Each step either completes a merge (pending==a and
    x==b → append a||b), flushes pending and holds x, or holds the
    first symbol.  The finish lambda flushes the final pending
    symbol."""
    merged = a + b
    state0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pending"),
    )

    def step(acc: Column, x: Column) -> Column:
        complete = (acc["pending"] == a) & (x == b)
        return F.when(
            complete,
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                F.lit(None).cast("string").alias("pending"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["pending"].isNull(), acc["out"]
                ).otherwise(
                    F.concat(acc["out"], F.array(acc["pending"]))
                ).alias("out"),
                x.alias("pending"),
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(
            acc["pending"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pending"])))

    return F.aggregate(symbols, state0, step, finish)


def bpe_train(
    df: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    max_words: int = 1_000_000,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus.  Returns the
    ordered merge list and the final (word, n, symbols) table.

    ``max_words`` bounds the word table the rounds iterate over (top
    words by count, ties by word — deterministic); at 100 TB this is
    the Heaps'-law working set, NOT the corpus.

    Each round CHECKPOINTS its symbol table (``localCheckpoint`` —
    materialize + truncate lineage, the same per-round discipline as
    the graph loops; a cluster run swaps in durable ``checkpoint``):
    materialization keeps every round one fold over the previous
    table instead of re-running the corpus scan plus all earlier
    folds, and the lineage CUT is what keeps the plan tree constant
    per round — measured with persist()-only rounds, the retained
    plan DOUBLED per merge (4→8→16→32 Exchange nodes for 1→4
    merges, 2^k growth): a 40-merge vocabulary would hand the driver
    a ~2^40-node plan at the first post-training action."""
    words = word_counts(df, text_col)
    top = words.orderBy(F.desc("n"), F.asc("word")).limit(max_words)
    cur = top.select(
        "word", "n", _initial_symbols(F.col("word")).alias("symbols")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = cur.select(
            F.col("n"),
            F.explode(
                F.when(
                    F.size("symbols") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("symbols") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("symbols"), i).alias("a"),
                            F.element_at(F.col("symbols"), i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        # eager localCheckpoint = materialize the one-fold increment
        # AND cut the lineage; the parent round's blocks are released
        # by the ContextCleaner once unreferenced
        cur = cur.select(
            "word", "n", _merge_pair(F.col("symbols"), a, b).alias("symbols")
        ).localCheckpoint(eager=True)
    return merges, cur


def bpe_segment_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    segmented: DataFrame | None = None,
) -> DataFrame:
    """(symbol, n_words_containing, total_occurrences) over the corpus
    after applying the learned merges — the vocabulary report a
    tokenizer build emits.  Pass ``bpe_train``'s final table as
    ``segmented`` to skip re-applying the merges from scratch."""
    if segmented is not None:
        sym = segmented.select("n", "symbols")
    else:
        words = word_counts(df, text_col)
        sym = words.select(
            "n", _initial_symbols(F.col("word")).alias("symbols")
        )
        for a, b in merges:
            # one fold per round, materialized + lineage-cut exactly
            # like the trainer: a merges-deep NESTED aggregate-lambda
            # chain is interpreter-bound (HOFs are codegen-ineligible
            # — measured ~12 s vs ~2 s at sf0.1 for 8 merges), and the
            # working set is the Heaps-law word table, so per-round
            # materialization is cheap at any corpus size
            sym = sym.select(
                "n", _merge_pair(F.col("symbols"), a, b).alias("symbols")
            ).localCheckpoint(eager=True)
    return (
        sym.select(F.col("n"), F.explode("symbols").alias("symbol"))
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n").alias("occurrences"),
        )
    )
