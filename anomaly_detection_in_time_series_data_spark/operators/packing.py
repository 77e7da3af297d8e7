"""Sequence packing: assign documents to fixed token-budget training
sequences ("packs").

Two standard disciplines, both sharded for scale:

- **Concat-then-chunk** (boundary-agnostic): documents are concatenated in
  a deterministic per-shard order and the stream is cut every ``budget``
  tokens; a document may straddle a cut. Pure window arithmetic (running
  token offset -> floor division), fully JVM-side, and exactly expressible
  in SQL — this is the oracle-checked path.
- **Greedy fill** (document-preserving): a document goes into the current
  pack if it fits, else opens a new pack; oversized documents get a pack of
  their own. The decision at row *i* depends on every prior decision in the
  shard, so there is no closed-form window expression; it runs as one
  Arrow-batched ``applyInPandas`` per shard.

Scale shape: packing is embarrassingly parallel ACROSS shards and
inherently sequential WITHIN a shard. Sharding by a hash/modulus of the doc
id bounds the sequential span to (corpus / #shards) and makes parallelism a
dial: pick #shards ≈ a few × cluster cores. Determinism: shard = doc_id %
n_shards and order-by doc_id inside the shard, so assignments are stable
across runs, partitionings, and engines (the property that makes training
runs reproducible). The greedy path's per-shard loop touches integers only
— no text moves through Python; token counts are computed JVM-side first.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from . import text


def _with_shard_tokens(
    df: DataFrame, id_col: str, text_col: str, n_shards: int
) -> DataFrame:
    return df.select(
        id_col,
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        text.token_count(text_col).cast("bigint").alias("n_tokens"),
    )


def concat_chunk_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    n_shards: int = 32,
) -> DataFrame:
    """Per-document (shard, start_pack, end_pack, is_split) under
    concat-then-chunk packing.

    ``start_pack = floor(offset / budget)`` where offset is the running
    token count of all prior docs in the shard; ``end_pack`` is the pack of
    the doc's last token. ``is_split`` marks boundary-straddling docs (the
    fraction a packing-quality report watches). Zero-token docs land at
    their offset's pack with ``is_split = false``.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = F.floor((cum - F.col("n_tokens")) / budget)
    end = F.when(
        F.col("n_tokens") > 0, F.floor((cum - 1) / budget)
    ).otherwise(start)
    return (
        _with_shard_tokens(df, id_col, text_col, n_shards)
        .select(
            id_col,
            "shard",
            "n_tokens",
            start.cast("bigint").alias("start_pack"),
            end.cast("bigint").alias("end_pack"),
        )
        .withColumn("is_split", F.col("end_pack") > F.col("start_pack"))
    )


def greedy_pack_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    n_shards: int = 32,
) -> DataFrame:
    """Per-document (shard, pack_id) under document-preserving greedy fill.

    Sequential within a shard (each decision depends on the shard's running
    fill), parallel across shards via one applyInPandas group per shard.
    The pandas loop iterates over two int arrays — no strings cross the
    Arrow boundary.
    """
    base = _with_shard_tokens(df, id_col, text_col, n_shards)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        toks = pdf["n_tokens"].to_numpy()
        pack_ids = [0] * len(toks)
        fill, pid = 0, 0
        for i, tok in enumerate(toks):
            if i > 0 and fill + tok > budget:
                pid += 1
                fill = 0
            fill += int(tok)
            pack_ids[i] = pid
        pdf["pack_id"] = pack_ids
        return pdf

    return base.groupBy("shard").applyInPandas(
        pack, schema=f"{id_col} bigint, shard int, n_tokens bigint, pack_id bigint"
    )
