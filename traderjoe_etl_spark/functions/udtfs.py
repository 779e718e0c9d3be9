"""Python UDTF surface (SURVEY.md §2B UDF/UDAF/UDTF).

The reference's row-expanding loops (P11's per-bin unpacking,
main.py:227-244) are expressed with ``explode`` over built-in array
functions elsewhere in the engine; the UDTF registry covers the residual
case where row expansion needs imperative Python (stateful-per-row parsing,
irregular record formats). Spark 4 Python UDTFs stream Arrow batches
through the worker — table-valued, usable from SQL via LATERAL.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="token: string, pos: int")
class TokenizeSpans:
    """Table-valued whitespace tokenizer: one output row per token with its
    ordinal position. The UDTF form (vs ``explode(split(...))``) exists to
    exercise LATERAL-join row expansion with imperative per-row logic —
    e.g. tokenizers whose state spans tokens (BPE merges) can't be a flat
    ``split``."""

    _WS = re.compile(r"\s+")

    def eval(self, text: str):  # noqa: A002
        if text is None:
            return
        pos = 0
        for tok in self._WS.split(text):
            if tok:
                yield tok, pos
                pos += 1


def register_udtfs(spark: SparkSession) -> None:
    """Expose the UDTF surface to SQL (`... , LATERAL tokenize_spans(text)`)."""
    spark.udtf.register("tokenize_spans", TokenizeSpans)
