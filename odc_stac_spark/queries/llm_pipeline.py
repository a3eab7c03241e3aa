"""Higher-order training-data pipeline operators.

- **dedup clustering**: near-dup pairs → connected components via
  iterative min-label propagation (the step after LSH in a real dedup
  pipeline: pick one survivor per duplicate cluster). Genuinely iterative
  DataFrame algorithm — loop on the driver, joins in the cluster,
  persist+localCheckpoint each round to cut lineage. The DuckDB oracle is
  a recursive CTE computing the same min-reachable-id labels.
- **stratified sampling**: deterministic md5-hash gate per document with
  per-language rates — reproducible sampling (no rand()), exactly what a
  data mixer uses; hash arithmetic matches DuckDB bit-for-bit.
- **token stats**: per-language top-k tokens (explode → count → window) —
  the vocabulary/frequency pass of corpus analysis.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .dedup import JACCARD_THRESHOLD, _hash32, _SHINGLES_SQL, dedup_ngram_jaccard
from . import register

SAMPLE_RATES = {"es": 50, "zh": 20}  # percent; default below
SAMPLE_DEFAULT = 10


def _pairs_sql() -> str:
    return f"""
        SELECT doc_a, doc_b FROM (
            WITH sh AS ({_SHINGLES_SQL}),
            cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b
            FROM pairs JOIN cnt ca ON ca.doc_id = doc_a
                       JOIN cnt cb ON cb.doc_id = doc_b
            WHERE shared * 1.0 / (ca.n + cb.n - shared) >= {JACCARD_THRESHOLD}
        )
    """


@register(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_pairs_sql()}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    verts AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(a, b) AS (
        SELECT doc_id, doc_id FROM verts
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    )
    SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a
    """,
    doc="dedup clustering: connected components over near-dup pairs via "
    "iterative min-label propagation (survivor selection after LSH).",
    tags=("dedup", "iterative"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct().withColumn("component", F.col("doc_id"))
    ).persist()
    # min-label propagation to fixpoint; components here are tiny (dup
    # clusters), so few rounds. localCheckpoint truncates lineage so the
    # plan doesn't grow with iterations (the Spark-idiomatic Pregel loop).
    for _ in range(20):
        neigh = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("neigh_min"))
        )
        new_labels = (
            labels.join(neigh, labels.doc_id == neigh.src, "left")
            .select(
                "doc_id",
                F.least(F.col("component"), F.coalesce(F.col("neigh_min"), F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", "component")


@register(
    "pipeline_training_prep",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, text, n_tokens,
             ROUND(0.4 * LEAST(n_tokens / 100.0, 1.0)
                 + 0.4 * LEAST(stop_ratio * 4, 1.0)
                 + 0.2 * LEAST(avg_token_len / 8.0, 1.0), 4) AS quality
      FROM (
        SELECT doc_id, lang, text,
               len(toks) AS n_tokens,
               ROUND(len(list_filter(toks, t -> list_contains(
                   ['the', 'and', 'of', 'to', 'a', 'in', 'is', 'on', 'for', 'with'], t)))
                     * 1.0 / len(toks), 4) AS stop_ratio,
               ROUND(length(array_to_string(toks, '')) * 1.0 / len(toks), 4)
                   AS avg_token_len
        FROM (SELECT doc_id, lang, text,
                     string_split_regex(trim(lower(text)), ' +') AS toks
              FROM documents)
        WHERE len(toks) > 0
      )
    ),
    filtered AS (SELECT * FROM scored WHERE quality >= 0.5),
    deduped AS (
      SELECT * FROM filtered
      WHERE doc_id IN (SELECT MIN(doc_id) FROM filtered
                       GROUP BY md5(trim(lower(text))))
    ),
    sampled AS (
      SELECT * FROM deduped
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 100 < 50
    )
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(quality), 4) AS avg_quality,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM sampled GROUP BY lang
    """,
    doc="END-TO-END training-data prep: quality filter (C4-style "
    "heuristics) → exact dedup keep-min → deterministic 50% sample → "
    "per-language corpus stats. One declarative plan — Catalyst fuses "
    "the stages; every intermediate is also an individually-gated query "
    "(text_quality_score / dedup_exact / sample_stratified).",
    tags=("text", "dedup", "sampling", "pipeline"),
)
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import STOPWORDS

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), " +")
    d = d.select("doc_id", "lang", "text", toks.alias("toks")).where(F.size("toks") > 0)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tokens = F.size("toks")
    stop_ratio = F.round(
        F.size(F.filter("toks", lambda t: F.array_contains(stop_arr, t))) / n_tokens, 4
    )
    avg_len = F.round(F.length(F.concat_ws("", F.col("toks"))) / n_tokens, 4)
    quality = F.round(
        0.4 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.4 * F.least(stop_ratio * 4, F.lit(1.0))
        + 0.2 * F.least(avg_len / 8.0, F.lit(1.0)),
        4,
    )
    scored = d.select("doc_id", "lang", "text", n_tokens.alias("n_tokens"), quality.alias("quality"))
    filtered = scored.where(F.col("quality") >= 0.5)
    keep = filtered.groupBy(F.md5(F.trim(F.lower(F.col("text")))).alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = filtered.join(keep.select("doc_id"), "doc_id", "left_semi")
    sampled = deduped.where(_hash32(F.col("doc_id").cast("string")) % 100 < 50)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@register(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, bucket
    FROM (SELECT doc_id, lang,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % 100 AS bucket
          FROM documents)
    WHERE bucket < CASE lang WHEN 'es' THEN {SAMPLE_RATES['es']}
                             WHEN 'zh' THEN {SAMPLE_RATES['zh']}
                             ELSE {SAMPLE_DEFAULT} END
    """,
    doc="stratified sampling: deterministic md5-hash gate with per-language "
    "rates (reproducible data mixing — no rand()).",
    tags=("text", "sampling"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = _hash32(F.col("doc_id").cast("string")) % 100
    rate = (
        F.when(F.col("lang") == "es", SAMPLE_RATES["es"])
        .when(F.col("lang") == "zh", SAMPLE_RATES["zh"])
        .otherwise(SAMPLE_DEFAULT)
    )
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .where(F.col("bucket") < rate)
    )


@register(
    "text_top_tokens_per_lang",
    oracle="""
    SELECT lang, tok, n, rn FROM (
        SELECT lang, tok, n,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rn
        FROM (SELECT lang, tok, COUNT(*) AS n
              FROM (SELECT lang,
                           UNNEST(string_split_regex(trim(lower(text)), ' +')) AS tok
                    FROM documents)
              GROUP BY 1, 2)
    ) WHERE rn <= 5
    """,
    doc="corpus vocabulary: top-5 tokens per language (explode → count → "
    "ranked window).",
    tags=("text",),
)
def text_top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), " +")
    counts = (
        d.select("lang", F.explode(toks).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("tok"))
    return counts.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5)


DECON_BENCH_MOD = 10  # ~10% of docs play the held-out benchmark split
DECON_MIN_FRAC = 0.3  # flag when ≥30% of a train doc's shingles hit a bench doc


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    gated AS (
        SELECT doc_id, shingle,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % {DECON_BENCH_MOD} = 0 AS is_bench
        FROM sh
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    hits AS (
        SELECT t.doc_id AS train_doc, b.doc_id AS bench_doc, COUNT(*) AS shared
        FROM gated t JOIN gated b ON t.shingle = b.shingle
        WHERE NOT t.is_bench AND b.is_bench
        GROUP BY 1, 2
    ),
    flagged AS (
        SELECT train_doc, bench_doc, shared, shared * 1.0 / c.n AS frac
        FROM hits JOIN cnt c ON c.doc_id = train_doc
        WHERE shared * 1.0 / c.n >= {DECON_MIN_FRAC}
    )
    SELECT train_doc AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bench_hits,
           ROUND(MAX(frac), 4) AS max_overlap_frac,
           MIN(bench_doc) AS example_bench_doc
    FROM flagged GROUP BY 1
    """,
    doc="benchmark decontamination: flag training documents whose token "
    "3-gram shingles overlap a held-out benchmark split (deterministic "
    "md5 doc gate) above DECON_MIN_FRAC — the standard eval-contamination "
    "scrub before training. Spark shape: the benchmark side is the tiny "
    "split, so its inverted index BROADCASTs and contamination detection "
    "is a map-side join over the training shingles; per-(train, bench) "
    "counts then aggregate per train doc. At 100 TB the benchmark index "
    "is built once and reused across corpus shards.",
    tags=("text", "dedup", "llm"),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _shingles_df

    sh = _shingles_df(spark, sf_dir)
    is_bench = _hash32(F.col("doc_id").cast("string")) % DECON_BENCH_MOD == 0
    bench = sh.where(is_bench).select(
        F.col("doc_id").alias("bench_doc"), "shingle"
    )
    train = sh.where(~is_bench).select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    hits = (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("train_doc", "bench_doc")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    flagged = (
        hits.join(cnt.withColumnRenamed("doc_id", "train_doc"), "train_doc")
        .withColumn("frac", F.col("shared") / F.col("n"))
        .where(F.col("frac") >= DECON_MIN_FRAC)
    )
    return flagged.groupBy(F.col("train_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.round(F.max("frac"), 4).alias("max_overlap_frac"),
        F.min("bench_doc").alias("example_bench_doc"),
    )
