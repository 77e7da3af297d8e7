"""Benchmark-contamination detection: word n-gram overlap between an
eval/benchmark split and the training corpus.

The standard decontamination step for LLM training pipelines (public
practice: n-gram overlap with n in the 8..13 range): an eval document is
contaminated when any of its word n-grams also appears in any training
document. This module computes, per eval document, how many of its distinct
n-grams occur anywhere in the training corpus.

Scale shape (the part that must survive 100 TB):

- Documents never meet documents. Each side is exploded to narrow
  ``(id, gram_hash)`` rows; the only join is a hash-equi join on the 64-bit
  gram hash — uniformly distributed keys, ordinary shuffle join, no
  quadratic candidate set and no skew (natural-language gram frequencies
  are capped by ``distinct()`` on the train side first).
- Grams are hashed to 8-byte ``xxhash64`` JVM-side immediately after
  generation, so the shuffle carries longs, not 8-word strings.
- The train side collapses to ``DISTINCT gram_hash`` before the join —
  map-side partial aggregation, and the hot-gram problem (a gram repeated
  in millions of train docs) disappears before any join happens.
- The gram generation reuses the staged-projection shingle pipeline from
  ``operators.dedup`` (tokenize once per doc; no per-element re-eval).

Reference parity note: the reference repo has no decontamination surface;
this is one of the beyond-reference training-pipeline operators the build
mandate adds (SURVEY.md §2 "LLM-data-pipeline extensions").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup


def train_gram_hashes(
    train: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct 64-bit hashes of every word n-gram in the training corpus.

    One narrow long column; ``distinct()`` collapses hot grams map-side so
    the downstream join sees each gram once regardless of train frequency.
    """
    return (
        dedup._explode_shingles(train, id_col, text_col, n)
        .select(F.xxhash64("_sh").alias("gram_hash"))
        .distinct()
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-eval-document contamination stats against the training corpus.

    Returns ``(id_col, n_grams, n_contaminated, contaminated_frac,
    is_contaminated)`` — one row per eval document having at least one
    n-gram (documents shorter than ``n`` tokens carry no n-gram evidence
    and are excluded, same as the SQL-oracle formulation).

    The left join keeps zero-hit eval docs, so the output is a complete
    per-doc report, not just the contaminated subset.
    """
    ev = dedup._explode_shingles(eval_df, id_col, text_col, n).select(
        id_col, F.xxhash64("_sh").alias("gram_hash")
    )
    hits = ev.join(
        train_gram_hashes(train, id_col, text_col, n).withColumn(
            "_hit", F.lit(1)
        ),
        "gram_hash",
        "left",
    )
    n_grams = F.count("*").cast("bigint")
    n_hit = F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint")
    return (
        hits.groupBy(id_col)
        .agg(n_grams.alias("n_grams"), n_hit.alias("n_contaminated"))
        .select(
            id_col,
            "n_grams",
            "n_contaminated",
            (F.col("n_contaminated").cast("double") / F.col("n_grams"))
            .alias("contaminated_frac"),
            (F.col("n_contaminated") > 0).alias("is_contaminated"),
        )
    )
