"""Structured Streaming surface (SURVEY.md §2.10, S7 + T1-T7)."""
