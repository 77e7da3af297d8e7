"""ML featurization operators (SURVEY.md §2.7 F8-F11, §2.10).

The reference's Keras-side featurization — multi-hot ``vectorize_sequences``
(`Imdb.pdf` cell [12]), one-hot ``to_one_hot`` (`NewsClassifier.pdf` cells
[11-12]), z-score normalization with train statistics applied to test
(`house_price.pdf`) and index->word decoding (`Imdb.pdf` cell [10]) — as
MLlib stages / DataFrame transforms.
"""

from __future__ import annotations

from pyspark.ml.feature import CountVectorizer, OneHotEncoder, StandardScaler
from pyspark.ml.functions import array_to_vector
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def multi_hot(df: DataFrame, words_col: str, *, vocab_size: int = 10000,
              out_col: str = "features") -> tuple[DataFrame, list[str]]:
    """F8: presence-only (0/1) vectorization — CountVectorizer(binary=True),
    exactly ``vectorize_sequences`` semantics. Returns (df, vocabulary)."""
    cv = CountVectorizer(
        inputCol=words_col, outputCol=out_col, vocabSize=vocab_size, binary=True
    )
    model = cv.fit(df)
    return model.transform(df), list(model.vocabulary)


def one_hot(df: DataFrame, label_col: str, out_col: str = "label_vec") -> DataFrame:
    """F9: one-hot encode an integer label column (keras ``to_categorical``).
    dropLast=False so every class gets its own slot, like the reference."""
    enc = OneHotEncoder(
        inputCols=[label_col], outputCols=[out_col], dropLast=False
    )
    return enc.fit(df).transform(df)


def zscore_scale(
    train: DataFrame, test: DataFrame, vec_col: str
) -> tuple[DataFrame, DataFrame]:
    """F10: column-wise z-score normalization fitting mean/std on *train*
    and applying the same statistics to *test* — the exact discipline the
    reference demonstrates in house_price.pdf (never refit on test)."""
    to_vec = lambda d: d.withColumn(  # noqa: E731
        "_v", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    scaler = StandardScaler(
        inputCol="_v", outputCol=f"{vec_col}_scaled", withMean=True, withStd=True
    )
    model = scaler.fit(to_vec(train))
    return (
        model.transform(to_vec(train)).drop("_v"),
        model.transform(to_vec(test)).drop("_v"),
    )


def index_to_word(indices_col: Column | str, vocabulary: list[str],
                  offset: int = 0, unknown: str = "?") -> Column:
    """F11: decode index sequences back to words via a literal map lookup
    (the reference's ``reverse_word_index.get(i-3, '?')`` join, Imdb.pdf
    cell [10]) — map_from_arrays constant-folds; no join, no UDF."""
    c = F.col(indices_col) if isinstance(indices_col, str) else indices_col
    m = F.map_from_arrays(
        F.array(*[F.lit(i) for i in range(len(vocabulary))]),
        F.array(*[F.lit(w) for w in vocabulary]),
    )
    return F.transform(
        c, lambda i: F.coalesce(m[i - F.lit(offset)], F.lit(unknown))
    )
