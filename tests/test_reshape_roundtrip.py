"""Wide↔long reshape round-trip and report-parser fuzz."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sparkgraft.operators.reshape import long_to_wide, wide_to_long
from sparkgraft.sources.report import parse_crack_rows


def test_wide_long_round_trip(spark):
    wide = spark.createDataFrame(
        [(1, 10.0, 100.0), (2, 20.0, 200.0)],
        "ts long, T_T1 double, BS_X double",
    )
    long = wide_to_long(wide, ["ts"], ["T_T1", "BS_X"])
    assert long.count() == 4
    back = long_to_wide(
        long, ["ts"], "channel", ["T_T1", "BS_X"], F.first("value")
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, wide.collect()))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.decimals(min_value=0, max_value=100, places=2, allow_nan=False),
            st.decimals(min_value=0, max_value=100, places=2, allow_nan=False),
            st.decimals(min_value=0, max_value=100, places=2, allow_nan=False),
            st.decimals(min_value=0, max_value=10, places=2, allow_nan=False),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_report_parser_fuzz(spark, rows):
    """Random comma-decimal data blocks parse to the exact values."""
    lines = [("f.txt", 1, "Titel"), ("f.txt", 2, "Rissposition (m) vs.")]
    for i, (x, y, z, w) in enumerate(rows):
        body = " ".join(str(v).replace(".", ",") for v in (x, y, z, w))
        lines.append(("f.txt", 3 + i, f"  {body}"))
    lines.append(("f.txt", 3 + len(rows), "End"))
    df = spark.createDataFrame(lines, "file string, line_no int, line string")
    parsed = sorted(
        (r["X"], r["Y"], r["Z"], r["wCr"])
        for r in parse_crack_rows(df).collect()
    )
    want = sorted((float(x), float(y), float(z), float(w)) for x, y, z, w in rows)
    assert parsed == want


def test_flatten_struct_nested(spark):
    from pyspark.sql import functions as F

    from sparkgraft.operators.reshape import flatten_struct

    df = spark.createDataFrame(
        [(1, ("x", (2.5, True))), (2, ("y", (3.5, False)))],
        "id long, a struct<s string, inner struct<v double, f boolean>>",
    )
    flat = flatten_struct(df)
    assert flat.columns == ["id", "a_s", "a_inner_v", "a_inner_f"]
    assert sorted(tuple(r) for r in flat.collect()) == [
        (1, "x", 2.5, True),
        (2, "y", 3.5, False),
    ]


def test_flatten_struct_prunes_scan(spark, tmp_path):
    from pyspark.sql import functions as F

    from sparkgraft.operators.reshape import flatten_struct
    from sparkgraft.plans import audit

    df = spark.createDataFrame(
        [(1, ("x", 2.5))], "id long, a struct<s string, v double>"
    )
    p = str(tmp_path / "nested.parquet")
    df.write.parquet(p)
    flat = flatten_struct(spark.read.parquet(p)).select("a_v")
    cols = audit.scan_schema_columns(flat)
    # only the struct leaf feeding a_v is read
    assert cols and all("s" not in c or "v" in str(c) for c in cols)
