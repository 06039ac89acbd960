"""Source readers (SURVEY §2.1)."""
