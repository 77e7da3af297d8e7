"""Email featurization pipeline (SURVEY.md §3.2, Assignment 4 parity).

Reference lifecycle: corpus scan -> parse UDF -> Tokenizer ->
CountVectorizer via ``pyspark.ml.Pipeline`` (`Assignment 4.py:490-514`).
Ours keeps the identical ML surface (custom Transformer + native stages)
with three fixes the reference lacked: distributed corpus scan, Arrow
vectorized parse UDF, and total parse semantics (multipart/HTML/bad-charset
inputs produce rows, not executor crashes).
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Pipeline, Transformer
from pyspark.ml.feature import CountVectorizer, Tokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.email_parse import parse_email


class ParseEmailsTransformer(Transformer):
    """U2: the reference's custom Transformer (`Assignment 4.py:490-499`),
    re-expressed over the Arrow UDF; hoists all struct fields to columns
    (P3 as a single ``parsed.*`` select, not a per-column withColumn loop).
    """

    @keyword_only
    def __init__(self, input_col: str = "original_msg") -> None:
        super().__init__()
        self._input_col = input_col

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return dataset.withColumn("parsed_email", parse_email(self._input_col)).select(
            "*", "parsed_email.*"
        ).drop("parsed_email")


def email_pipeline(
    *, vocab_size: int = 10000, min_df: float = 1.0, binary: bool = False
) -> Pipeline:
    """U3: the full parse -> tokenize -> count-vectorize pipeline.

    ``binary=True`` gives the multi-hot vectorization of `Imdb.pdf` cell
    [12] / `NewsClassifier.pdf` cell [10] (F8) on the same stage.
    """
    return Pipeline(
        stages=[
            ParseEmailsTransformer(input_col="original_msg"),
            Tokenizer(inputCol="text", outputCol="words"),
            CountVectorizer(
                inputCol="words",
                outputCol="features",
                vocabSize=vocab_size,
                minDF=min_df,
                binary=binary,
            ),
        ]
    )


def featurize_emails(raw: DataFrame, **kwargs) -> DataFrame:
    """Fit + transform in one call; returns id/username/words/features plus
    all parsed header columns. Never throws on malformed messages."""
    model = email_pipeline(**kwargs).fit(raw)
    out = model.transform(raw)
    return out.withColumn(
        "n_tokens", F.when(F.col("words").isNotNull(), F.size("words")).otherwise(0)
    )
