"""Batch relational, window, and stream-semantics operators (SURVEY.md §2.2)."""
