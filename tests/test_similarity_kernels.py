"""The expression-based and Arrow-batched cosine kernels agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraft.operators.similarity import cosine, cosine_pandas_udf
from sparkgraft.sources.readers import read_table
from tests.conftest import SF_DIR


def test_expression_and_pandas_udf_cosine_agree(spark):
    emb = read_table(spark, SF_DIR, "embeddings").limit(50)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
    kernel = cosine_pandas_udf(dim=64)
    out = pairs.select(
        "ia",
        "ib",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("expr_cos"),
        F.round(kernel(F.col("va"), F.col("vb")), 6).alias("udf_cos"),
    )
    mismatched = out.filter(F.col("expr_cos") != F.col("udf_cos")).count()
    assert mismatched == 0


def test_lsh_bucket_dim_mismatch_raises(spark):
    """A vector shorter than the plane dimension must fail loudly —
    zip_with null-padding used to collapse every vector into bucket 0,
    silently degrading the bucketed join into a full cross join."""
    import pytest
    from pyspark.sql import functions as F

    from sparkgraft.operators.similarity import hyperplane_signs, lsh_bucket

    planes = hyperplane_signs(4, 8)
    bad = spark.createDataFrame([([1.0] * 6,)], "v array<double>")
    with pytest.raises(Exception, match="lsh_bucket|USER_RAISED"):
        bad.select(lsh_bucket(F.col("v"), planes)).collect()
    ok = spark.createDataFrame([([1.0] * 8,)], "v array<double>")
    got = ok.select(lsh_bucket(F.col("v"), planes).alias("b")).collect()
    assert got[0]["b"] is not None
