"""sparkgraft — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame/SQL + Structured Streaming)
engine with the query and data-processing capabilities of the reference
SHM ETL pipeline ``oea-lpi/2412511_datapipeline`` (surveyed in
``SURVEY.md``; reference citations in docstrings point into
``/root/reference``).  Not a port: the reference's thread/queue/Redis
dataflow is re-expressed as declarative DataFrame plans so Catalyst +
Tungsten pick the physical strategy, and every operator is designed for
multi-executor scale (partition-aware, broadcast-aware, shuffle-minimal).

Layout
------
``sparkgraft.session``    SparkSession factory with scale-tuned defaults.
``sparkgraft.functions``  Scalar column expressions (SURVEY §2.8 F1–F13)
                          plus text/vector helpers for the LLM-data ops.
``sparkgraft.operators``  Relational + statistical operators
                          (SURVEY §2.2–§2.7, A-family stats, dedup,
                          similarity search, text analysis).
``sparkgraft.sources``    Readers (SURVEY §2.1 S1–S8) incl. the
                          semi-structured report parser.
``sparkgraft.sinks``      KV projection / register image / event store
                          (SURVEY §2.10), testable as DataFrames.
``sparkgraft.streaming``  File-arrival micro-batch runner with debounce,
                          quarantine, archive and health signals
                          (SURVEY §2.9 T1–T7).
``sparkgraft.plans``      Plan-inspection helpers (broadcast audit,
                          pushdown audit) used by tests and tuning.
"""

__version__ = "0.1.0"
