"""Query operators, grouped by family (SURVEY.md §2)."""
