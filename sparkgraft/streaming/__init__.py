"""Structured-Streaming file-arrival pipeline (SURVEY §2.9 T1–T7)."""
