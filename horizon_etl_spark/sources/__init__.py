"""File-format sources beyond what Spark ships (SURVEY §2.1)."""
