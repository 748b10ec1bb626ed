"""Custom data sources (SURVEY.md §7 phase 4)."""
