"""Operator inventory modules (SURVEY.md §2 + north-star extensions)."""
