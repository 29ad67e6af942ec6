"""Structured Streaming surface.

The reference is pure batch (SURVEY.md §2.7) — resumability there is
git-commit-per-type.  This module adds the Spark-native incremental
ingestion path: new source records stream through the SAME record-local
parse stage and append to the triple table, with exactly-once progress
via the streaming checkpoint.  Windowed/stateful operators over the
synthetic `events` table live in queries/streamq.py.
"""
