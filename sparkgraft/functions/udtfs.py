"""Python UDTF surface (SURVEY §2.11).

The reference exposes user-defined row-expanding parsers (the report
line → crack-row expansion in file_analysis.py); Spark 4's Python UDTF
is the native registration point for that shape: a class whose
``eval`` yields zero-or-more rows per input, callable from SQL via
``LATERAL``.

These are the SLOW path — per-row Python, like any Python UDF — so
every engine kernel with a hot path has an expression form instead
(the report parser is `regexp` + `posexplode`; tokenization is
`split`).  The UDTF registration exists for API parity and for user
extensions whose logic genuinely cannot be expressed in columns; the
test asserts the UDTF agrees with the expression form exactly.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="token string, idx int")
class TokenizeUDTF:
    """Whitespace tokenizer as a row-expanding UDTF — one (token,
    position) row per token; the UDTF twin of
    ``posexplode(split(text))``."""

    def eval(self, text: str):  # noqa: ANN201 - Spark UDTF protocol
        for i, tok in enumerate((text or "").split()):
            yield tok, i


@udtf(returnType="line_no int, line string")
class NumberedLinesUDTF:
    """Split a document into numbered lines — the report-file
    line-expansion shape (file_analysis.py reads line-per-record
    blocks; this is its engine-side registration point)."""

    def eval(self, text: str):  # noqa: ANN201 - Spark UDTF protocol
        for i, line in enumerate((text or "").splitlines()):
            yield i, line


def register_udtfs(spark: SparkSession) -> None:
    """Register the engine's UDTFs for SQL use (``LATERAL
    tokenize_udtf(col)``)."""
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    spark.udtf.register("numbered_lines_udtf", NumberedLinesUDTF)
