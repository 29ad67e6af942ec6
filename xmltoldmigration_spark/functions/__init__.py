"""Pure scalar functions (SURVEY.md §2.3 C1-C24).

Every function here is a pure per-value transform, unit-tested against
the reference's MigrationTest scalar cases and invoked from inside the
vectorized parse stage (kg/parse.py) — never as row-at-a-time Python UDFs.
"""
