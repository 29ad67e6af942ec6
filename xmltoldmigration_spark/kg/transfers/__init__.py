"""CSV-record transfer pipelines (SURVEY.md §2.1 S5): one CSV row ->
1-3 entity graphs.  Reference: the top-package *Transfer classes.

Each transfer exposes `resources_from_line(line, ctx) -> list[Emitter]`
(pure Python, unit-tested against the one-line golden fixtures) plus a
Spark wrapper that maps a CSV DataFrame through it.
"""
