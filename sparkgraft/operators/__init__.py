"""Relational + statistical operators (SURVEY §2.2–§2.7, LLM-data ops)."""
