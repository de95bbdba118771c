"""Relational operators (SURVEY.md §2.1–§2.4), expressed Spark-first."""
