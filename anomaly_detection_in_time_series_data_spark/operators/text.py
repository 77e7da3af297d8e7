"""Text-analysis operators for the training-data pipeline over `documents`.

All hot-path work is built-in expression (split/regexp/length — JVM,
codegen). Language-ID uses a stopword-hit heuristic expressed as columns, so
it stays JVM-side too; no Python in any per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace tokenizer shared by every op (same regex in the DuckDB oracle).
_WS = r"\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text; empty text -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, _WS)
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_chars, avg token length — the basic corpus stats."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_computed", n_chars)
        .withColumn(
            "avg_token_len",
            F.when(
                n_tokens > 0,
                F.length(F.regexp_replace(F.trim(F.col(text_col)), _WS, "")) / n_tokens,
            ).otherwise(F.lit(0.0)),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality signals (length / punctuation / casing).

    Mirrors the standard pretraining-corpus filters (C4/Gopher-style rules,
    public): token count bounds, mean token length bounds, symbol ratio.
    Emits the raw signals plus a boolean ``quality_ok``.
    """
    d = with_token_stats(df, text_col)
    n_punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    punct_ratio = F.when(
        F.length(F.col(text_col)) > 0, n_punct / F.length(F.col(text_col))
    ).otherwise(F.lit(0.0))
    d = d.withColumn("punct_ratio", punct_ratio)
    return d.withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 5)
        & (F.col("avg_token_len") >= 2)
        & (F.col("avg_token_len") <= 12)
        & (F.col("punct_ratio") <= 0.2),
    )


def term_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Corpus term frequencies: explode(tokens) -> groupBy(term).count().

    The SQL-oracle twin of CountVectorizer's fit-side aggregation
    (SURVEY §2.4 A7; `Assignment 4.py:501`). Partial aggregation (map-side
    combine) applies automatically — the shuffle carries one row per distinct
    term per partition, not per token.
    """
    c = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        df.select(F.explode(tokens(c)).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count("*").alias("term_count"))
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercased text. Identical function exists in DuckDB, so the oracle
    matches byte-for-byte."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), _WS, " ")))


# Tiny per-language stopword marker sets for the heuristic language-ID.
# Chosen to be high-frequency, language-distinctive, and ASCII-safe where
# possible; zh matches single CJK chars.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "que", "sur"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "von"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "为"],
}


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language marker-hit counts as columns (all JVM-side).

    For latin-script languages: count of tokens that are in the marker set.
    For zh: count of marker characters present in the raw text.
    """
    toks = tokens(F.lower(F.col(text_col)))
    scores: dict[str, Column] = {}
    for lang, markers in _LANG_MARKERS.items():
        if lang == "zh":
            hits = [F.when(F.col(text_col).contains(m), 1).otherwise(0) for m in markers]
            scores[lang] = sum(hits[1:], hits[0])
        else:
            arr = F.array(*[F.lit(m) for m in markers])
            scores[lang] = F.size(F.array_intersect(toks, arr))
    return scores


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language-ID: argmax of marker-hit counts, 'und' if no hits.

    Ties resolve in the fixed order en>es>fr>de>zh (documented, deterministic).
    """
    scores = lang_scores(text_col)
    d = df
    for lang, score in scores.items():
        d = d.withColumn(f"_s_{lang}", score)
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in _LANG_MARKERS])
    label = F.lit("und")
    for lang in reversed(list(_LANG_MARKERS)):
        label = F.when(
            (F.col(f"_s_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(label)
    return d.withColumn("lang_pred", label).drop(
        *[f"_s_{lang}" for lang in _LANG_MARKERS]
    )


def chunk_text_udtf():
    """Python UDTF (Spark 4 table-function surface) that chunks a document
    into overlapping word windows — the canonical LLM-training-data
    chunking op. Emits one row per (chunk_idx, chunk, n_tokens) with
    ``window`` words per chunk advancing by ``stride`` (= window-overlap).

    The arrow-optimized UDTF is the supported custom-generator path; for
    the pure-SQL twin (used as the oracle) the same chunks come from
    ``generate_series`` + ``array_slice``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, chunk_idx: bigint, chunk: string, n_tokens: bigint")
    class ChunkText:
        WINDOW = 32
        STRIDE = 24

        def eval(self, doc_id: int, text: str):  # noqa: ANN001 — Spark UDTF API
            toks = (text or "").strip().split()
            if not toks:
                return
            for idx, start in enumerate(range(0, len(toks), self.STRIDE)):
                piece = toks[start : start + self.WINDOW]
                yield (doc_id, idx, " ".join(piece), len(piece))

    return ChunkText
