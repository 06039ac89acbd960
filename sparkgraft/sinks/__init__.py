"""Sinks (SURVEY §2.10) — testable as DataFrames, transport-free."""
