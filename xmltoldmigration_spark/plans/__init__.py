"""Staged batch plans (the Spark lifecycle of SURVEY.md §3.4)."""
