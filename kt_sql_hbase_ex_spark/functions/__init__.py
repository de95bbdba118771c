"""Scalar functions + LLM-pipeline operators (text, dedup, similarity)."""
