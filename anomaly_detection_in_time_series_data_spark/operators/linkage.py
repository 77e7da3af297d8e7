"""Record linkage: edit-distance candidate generation that scales.

A naive blocked fuzzy join is quadratic inside each block — fine when
blocks are tiny, a wall at 100 TB the moment one block is hot. For
edit-distance-1 matching the standard sub-quadratic design (SymSpell /
deletion-neighborhood indexing) replaces the block self-join with an
inverted index join:

  every string s emits {s} U { s with character i deleted } — len(s)+1
  keys. Two strings within Levenshtein distance 1 ALWAYS share a key
  (substitution pairs share the deletion-at-the-differing-position key;
  insertion/deletion pairs share the shorter string itself; equal strings
  share everything), so an equi-join on (block, variant) yields a
  candidate superset, verified by one exact levenshtein() per candidate.

Work is O(n x len) index rows and the join fans out only where variants
collide (i.e., near-duplicates actually exist) — the same
candidates-then-verify shape as the MinHash/SimHash operators in
`dedup.py`, specialized to edit distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DELETION_VARIANTS = """
array_union(
  array({col}),
  transform(
    sequence(1, length({col})),
    i -> concat(substring({col}, 1, i - 1),
                substring({col}, i + 1, length({col})))
  )
)
"""


def edit1_pairs(
    df: DataFrame,
    *,
    block_col: str,
    key_col: str,
    name_col: str,
) -> DataFrame:
    """Unordered pairs (k1 < k2) within a block at Levenshtein distance <= 1.

    Returns columns (block, k1, k2, n1, n2). Candidate generation is the
    deletion-neighborhood inverted index; verification is exact, so the
    result equals the quadratic blocked join's output row-for-row.
    """
    idx = df.select(
        F.col(block_col).alias("_b"),
        F.col(key_col).alias("_k"),
        F.col(name_col).alias("_n"),
    ).select(
        "_b",
        "_k",
        "_n",
        F.explode(F.expr(_DELETION_VARIANTS.format(col="_n"))).alias("_v"),
    )
    left = idx.select(
        F.col("_b"), F.col("_v"), F.col("_k").alias("k1"), F.col("_n").alias("n1")
    )
    right = idx.select(
        F.col("_b"), F.col("_v"), F.col("_k").alias("k2"), F.col("_n").alias("n2")
    )
    return (
        left.join(right, ["_b", "_v"])
        .filter(F.col("k1") < F.col("k2"))
        # a pair can share several variant keys (equal strings share all);
        # collapse before the exact verify so levenshtein runs once per pair
        .select(F.col("_b").alias("block"), "k1", "k2", "n1", "n2")
        .distinct()
        .filter(F.levenshtein("n1", "n2") <= 1)
    )
