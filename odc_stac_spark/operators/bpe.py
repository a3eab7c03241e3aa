"""Distributed BPE (byte-pair-encoding) vocabulary training — the
tokenizer-building step of an LLM data pipeline, Spark-first.

The classic Sennrich et al. (2016) algorithm over a WORD HISTOGRAM: the
corpus collapses to (word, count) once (one shuffle over the raw text —
the only pass that touches the full corpus), then every merge iteration
runs on that compact table:

1. pair counting — ``posexplode`` of adjacent symbol pairs weighted by
   word count, one ``groupBy(pair).sum`` (map-side partial aggregation;
   the histogram is vocabulary-sized, not corpus-sized);
2. argmax with a DETERMINISTIC tie-break (count desc, then pair
   lexicographic) so the merge sequence is reproducible across runs and
   cluster layouts;
3. applying the merge to every word symbol array as a pure Catalyst
   fold (``aggregate``: append, or coalesce the last element when it
   completes the chosen pair) — no UDFs anywhere.

Scale: at 100 TB the word histogram for natural language is millions of
rows (Heaps' law), so per-iteration work is a small shuffle independent
of corpus size; the driver holds only K merge rules (like
operators/kmeans.py holding K centroids). The iterative argmax has no
direct SQL image, but the trainer is exactly deterministic (integer
counts, lexicographic tie-break), so the DuckDB gate uses a GOLDEN
merge sequence per oracle corpus (tools/gen_bpe_train_golden.py);
tests/test_bpe.py additionally enforces EXACT merge-sequence parity
against the independent sequential reference implementation.
"""

from __future__ import annotations

from typing import List, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Target histogram rows per partition for the merge-iteration loop; the
# loop re-layouts the vocab-sized histogram to ceil(rows/this), capped
# at the session's parallelism (scale-adaptive: 1 partition at test
# scales, fans out on real Heaps'-law vocabularies).
_HIST_ROWS_PER_PARTITION = 65536


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → (word, count) — the one corpus-sized pass."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).where(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def _merge_expr(a: str, b: str):
    """Catalyst fold applying one merge rule (a, b) → a+b to a symbol
    array: walk the array once, gluing an occurrence of ``b`` onto a
    pending ``a``. Left-to-right greedy, exactly like the reference
    algorithm's in-word scan."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == la)
            & (t == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, lb))
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 20, text_col: str = "text"
) -> List[Tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules → [(step, left, right, count)].

    Driver holds only the rules; every iteration is ONE narrow job over
    the checkpointed word histogram (the previous step's merge rewrite
    rides lazily under the next pair-count/argmax job)."""
    hist = word_histogram(docs, text_col).withColumn(
        "syms", F.split(F.col("word"), "")
    ).select("syms", "cnt")
    initial_hist = hist.persist()
    n_words = initial_hist.count()  # materialize the corpus pass once
    # Size the iteration-loop partitioning from the HISTOGRAM, not the
    # corpus: the loop's working set is vocabulary-sized (Heaps' law),
    # and inheriting the corpus pass's partitioning schedules a full
    # task wave per job for what is usually a much smaller table. One
    # cheap re-layout job here makes all 2×n_merges downstream jobs
    # npart-task jobs (npart=1 at the bench scales; grows with the
    # vocabulary, capped at the session's parallelism, on real corpora).
    npart = max(
        1,
        min(
            docs.sparkSession.sparkContext.defaultParallelism,
            (n_words + _HIST_ROWS_PER_PARTITION - 1)
            // _HIST_ROWS_PER_PARTITION,
        ),
    )
    hist = initial_hist.coalesce(npart).localCheckpoint()
    merges: List[Tuple[int, str, str, int]] = []
    try:
        for step in range(n_merges):
            pairs = hist.select(
                F.col("cnt"),
                F.posexplode(F.slice(F.col("syms"), 1, F.size("syms") - 1)).alias(
                    "i", "left"
                ),
                F.col("syms"),
            ).select(
                "cnt",
                "left",
                F.element_at(F.col("syms"), F.col("i") + 2).alias("right"),
            )
            top = (
                pairs.groupBy("left", "right")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
            if n < 2:
                break  # nothing left worth merging
            merges.append((step, a, b, n))
            # localCheckpoint (not persist): each iteration's rewrite
            # nests another aggregate fold into the logical plan, so by
            # step K an un-truncated plan carries K folds that Catalyst
            # re-analyzes per job — checkpointing cuts the lineage to a
            # materialized scan (same pattern as the connected-components
            # loop in queries/llm_pipeline.py). eager=False fuses the
            # rewrite under the NEXT iteration's argmax job (one driver
            # round-trip per merge instead of two); lineage still
            # truncates at that job because the blocks materialize there.
            # NOTE: `hist` is a localCheckpoint, whose RDD blocks are NOT
            # registered with the cache manager — DataFrame.unpersist
            # there would be a no-op, so cleanup of checkpointed
            # iterations is ContextCleaner/GC-driven by design (ADVICE
            # r11). Only the corpus-pass persist is explicitly released
            # (in the finally; double-unpersist is a harmless no-op).
            new_hist = hist.withColumn("syms", _merge_expr(a, b)).localCheckpoint(
                eager=False
            )
            hist = new_hist
    finally:
        initial_hist.unpersist()
    return merges


def bpe_reference(texts_with_counts, n_merges: int = 20):
    """Independent sequential reference (the textbook algorithm) used by
    the tests to pin the distributed trainer's merge sequence exactly.
    ``texts_with_counts``: iterable of (word, count)."""
    hist = {tuple(w): c for w, c in (
        (list(word), cnt) for word, cnt in texts_with_counts
    )}
    merges = []
    for step in range(n_merges):
        counts: dict = {}
        for syms, cnt in hist.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get(
                    (syms[i], syms[i + 1]), 0
                ) + cnt
        if not counts:
            break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((step, a, b, n))
        new_hist: dict = {}
        for syms, cnt in hist.items():
            out = []
            for t in syms:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            key = tuple(out)
            new_hist[key] = new_hist.get(key, 0) + cnt
        hist = new_hist
    return merges


def bpe_encode_vocab(
    vocab: DataFrame, merges: List[Tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Tokenize a (distinct) vocabulary with a FROZEN merge table —
    the serving half of BPE (production pipelines apply a fixed
    tokenizer; they do not retrain per corpus).

    Each merge rule is one pure Catalyst ``aggregate`` fold over the
    symbol array (same left-to-right glue as training), chained in rank
    order — no UDFs. Intended use at 100 TB: run this over the DISTINCT
    words (vocabulary-sized, Heaps' law), then broadcast-join the
    word→tokens map back onto the corpus, so the merge folds never touch
    corpus-sized data.

    Returns (word, n_toks, tok_str) with tokens joined by '|'.
    """
    df = vocab.withColumn("syms", F.split(F.col(word_col), ""))
    for a, b in merges:
        df = df.withColumn("syms", _merge_expr(a, b))
    return df.select(
        F.col(word_col),
        F.size("syms").alias("n_toks"),
        F.array_join("syms", "|").alias("tok_str"),
    )
