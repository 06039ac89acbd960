"""S4 — semi-structured crack-report parser (SURVEY §2.1 S4, §2.4 A4/A6).

Reference: ``file_analysis.py:7-86`` parses a German fixed-layout text
report: title line, ``Zeit <dd-MMM-yyyy HH:mm:ss>`` timestamp, a
``q50 q90 max wCr`` quantile header + value row (comma decimals), an
``Anzahl erkannter Risse: N`` count, a ``Rissposition ... vs. ...``
block header and whitespace-delimited numeric rows until ``End``.

Spark-first restatement: the report is a lines DataFrame
``(file, line_no, line)`` (from ``spark.read.text`` with
``input_file_name``/``monotonically_increasing_id`` or the streaming
source); parsing is pure column expressions + per-file window
aggregation — one shuffle on the file key, no Python in the row path,
so thousands of reports parse in parallel across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkgraft.functions.expr import comma_decimal
from sparkgraft.operators.stats import exact_mean, scaled_long

# A token is numeric if it is an optionally-signed integer with an
# optional comma- or dot-decimal fraction (file_analysis.py:70-73:
# re.findall(r"[-+]?\d+(?:[.,]\d+)?", ln)).
NUM_TOKEN_RE = r"[-+]?\d+(?:[.,]\d+)?"


def _num_tokens(line):
    return F.regexp_extract_all(F.trim(line), F.lit(NUM_TOKEN_RE), 0)


def parse_crack_rows(lines: DataFrame) -> DataFrame:
    """The numeric crack-position block → ``(file, X, Y, Z, wCr)``.

    Rows qualify when they carry ≥4 numeric tokens and sit strictly
    between the ``Rissposition`` block header and the ``End`` sentinel
    (file_analysis.py:48-73: stop at a line starting with 'end',
    case-insensitive, keep ≥4-numeric rows; when no sentinel exists the
    reference's loop simply runs to EOF, so end_ln falls back to
    max(line_no)+1).
    """
    w = Window.partitionBy("file")
    marked = lines.withColumn(
        "blk",
        F.min(
            F.when(F.col("line").startswith("Rissposition"), F.col("line_no"))
        ).over(w),
    ).withColumn(
        "end_ln",
        F.coalesce(
            F.min(
                F.when(
                    F.lower(F.trim(F.col("line"))).startswith("end")
                    & (F.col("line_no") > F.col("blk")),
                    F.col("line_no"),
                )
            ).over(w),
            F.max(F.col("line_no")).over(w) + F.lit(1),
        ),
    )
    toks = _num_tokens(F.col("line"))
    data = marked.filter(
        (F.col("line_no") > F.col("blk"))
        & (F.col("line_no") < F.col("end_ln"))
        & (F.size(toks) >= 4)
    )
    return data.select(
        "file",
        comma_decimal(toks[0]).alias("X"),
        comma_decimal(toks[1]).alias("Y"),
        comma_decimal(toks[2]).alias("Z"),
        comma_decimal(toks[3]).alias("wCr"),
    )


def parse_report_meta(lines: DataFrame) -> DataFrame:
    """Per-report metadata: title, timestamp, quantiles, crack count.

    One grouped aggregation per file (file_analysis.py:7-47):
    title = first line; ``Zeit`` line → timestamp (``dd-MMM-yyyy``);
    the value row directly under the ``q50 q90 max wCr`` header →
    q50/q90/max (comma decimals, 'mm' unit token ignored);
    ``Anzahl erkannter Risse: N`` → count.
    """
    w = Window.partitionBy("file")
    qhdr = F.min(
        F.when(F.trim(F.col("line")).startswith("q50"), F.col("line_no"))
    ).over(w)
    marked = lines.withColumn("qhdr", qhdr)
    toks = _num_tokens(F.col("line"))
    return marked.groupBy("file").agg(
        F.min_by("line", "line_no").alias("title"),
        F.to_timestamp(
            F.min(
                F.when(
                    F.col("line").startswith("Zeit"),
                    F.regexp_extract(
                        F.col("line"), r"Zeit\s+(\d{2}-\w{3}-\d{4} \d{2}:\d{2}:\d{2})", 1
                    ),
                )
            ),
            "dd-MMM-yyyy HH:mm:ss",
        ).alias("report_ts"),
        comma_decimal(
            F.min(F.when(F.col("line_no") == F.col("qhdr") + 1, toks[0]))
        ).alias("q50_mm"),
        comma_decimal(
            F.min(F.when(F.col("line_no") == F.col("qhdr") + 1, toks[1]))
        ).alias("q90_mm"),
        comma_decimal(
            F.min(F.when(F.col("line_no") == F.col("qhdr") + 1, toks[2]))
        ).alias("wCr_max_mm"),
        F.min(
            F.when(
                F.col("line").startswith("Anzahl"),
                F.regexp_extract(F.col("line"), r"(\d+)", 1).cast("bigint"),
            )
        ).alias("crack_count"),
    )


def crack_statistics(rows: DataFrame, digits: int = 4) -> DataFrame:
    """A6 upstream-stats over parsed crack rows: the mapping.json metric
    set (mean/max/p50/p90 crack width, counts) computed natively —
    closing the reference's upstream gap (SURVEY §2.4 A6)."""
    wcr = F.col("wCr")
    return rows.groupBy("file").agg(
        exact_mean(F.sum(scaled_long(wcr)), F.count(wcr), digits).alias(
            "mean_crack_width"
        ),
        F.round(F.max(wcr), digits).alias("max_crack_width"),
        F.round(F.percentile(wcr, F.lit(0.5)), digits).alias("p50_crack_width"),
        F.round(F.percentile(wcr, F.lit(0.9)), digits).alias("p90_crack_width"),
        F.count("*").alias("number_of_cracks"),
        F.count(F.when(F.isnan(wcr) | wcr.isNull(), F.lit(1))).alias(
            "number_of_nans"
        ),
    )
