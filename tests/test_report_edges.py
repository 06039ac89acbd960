"""Report-parser degenerate inputs: missing sections yield NULLs (not
errors), truncated reports yield no rows — P8/P9 tolerant-parse
semantics."""

from __future__ import annotations

from sparkgraft.sources.report import parse_crack_rows, parse_report_meta


def _lines(spark, rows):
    return spark.createDataFrame(rows, "file string, line_no int, line string")


def test_report_without_zeit_or_count(spark):
    rows = [
        ("r.txt", 1, "Titel ohne Metadaten"),
        ("r.txt", 2, "Rissposition (m) vs. Rissbreite (mm)"),
        ("r.txt", 3, "  1,0 2,0 3,0 0,5"),
        ("r.txt", 4, "End"),
    ]
    meta = parse_report_meta(_lines(spark, rows)).collect()[0]
    assert meta["title"] == "Titel ohne Metadaten"
    assert meta["report_ts"] is None
    assert meta["q50_mm"] is None
    assert meta["crack_count"] is None
    parsed = parse_crack_rows(_lines(spark, rows)).collect()
    assert len(parsed) == 1 and parsed[0]["wCr"] == 0.5


def test_report_without_end_sentinel_parses_to_eof(spark):
    rows = [
        ("r.txt", 1, "Titel"),
        ("r.txt", 2, "Rissposition (m) vs. Rissbreite (mm)"),
        ("r.txt", 3, "  1,0 2,0 3,0 0,5"),
        ("r.txt", 4, "  2,0 3,0 4,0 0,7"),
    ]
    # No End marker → the block runs to EOF (file_analysis.py:64-73
    # iterates lines[i_block+2:] and only breaks early ON the sentinel).
    got = parse_crack_rows(_lines(spark, rows)).collect()
    assert sorted(r["wCr"] for r in got) == [0.5, 0.7]


def test_report_dot_decimals_signs_and_lowercase_end(spark):
    rows = [
        ("r.txt", 1, "Titel"),
        ("r.txt", 2, "Rissposition (m) vs. Rissbreite (mm)"),
        ("r.txt", 3, "  1.25 +0.40 -2.10 0.12"),
        ("r.txt", 4, "  3,75 0,40 2,10 0,45"),
        ("r.txt", 5, "end of data"),
        ("r.txt", 6, "  9,0 9,0 9,0 9,0"),
    ]
    # Reference tokenizer is [-+]?\d+(?:[.,]\d+)? and the sentinel check
    # is lower().startswith('end') (file_analysis.py:64-70): dot and
    # comma decimals coexist, signs survive, 'end...' clips the block.
    got = sorted(
        parse_crack_rows(_lines(spark, rows)).collect(), key=lambda r: r["X"]
    )
    assert [(r["X"], r["Y"], r["Z"], r["wCr"]) for r in got] == [
        (1.25, 0.40, -2.10, 0.12),
        (3.75, 0.40, 2.10, 0.45),
    ]


def test_report_rows_with_too_few_tokens_skipped(spark):
    rows = [
        ("r.txt", 1, "Titel"),
        ("r.txt", 2, "Rissposition (m) vs. Rissbreite (mm)"),
        ("r.txt", 3, "  1,0 2,0"),
        ("r.txt", 4, "  kein zahlenblock hier"),
        ("r.txt", 5, "  4,0 5,0 6,0 0,7"),
        ("r.txt", 6, "End"),
    ]
    parsed = parse_crack_rows(_lines(spark, rows)).collect()
    assert len(parsed) == 1 and parsed[0]["X"] == 4.0
