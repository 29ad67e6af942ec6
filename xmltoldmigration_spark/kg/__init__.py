"""Knowledge-graph construction pipeline (the engine's north-star surface).

Re-expresses the reference's TBRC-XML -> BDRC-RDF migration
(/root/reference, buda-base/xmltoldmigration) as staged PySpark
DataFrame transforms:

  parse (mapInArrow, record-local)  ->  link (broadcast joins)
  ->  symmetric completion (union + dedup)  ->  canonicalize
  (connected components + rewrite)  ->  write (partitioned, checkpointed)

Record-local semantics live in `migrators/` as pure Python functions so
they are unit-testable against the reference golden corpus without a
SparkSession; `parse.py` wraps them in an Arrow-native mapInArrow stage.
"""
