"""Per-type record migrators (the reference's xml2files/ package).

Each module exposes `migrate(root, ctx) -> list[Emitter]`: pure Python,
record-local, no Spark — wrapped by kg/parse.py into the vectorized
parse stage and unit-tested against the golden corpus in
tests/test_kg_parity.py.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from xmltoldmigration_spark.kg.common import Ctx


def migrate_record(rtype: str, content: str, ctx: Ctx):
    """Dispatch one XML record to its migrator (MigrationHelpers.xmlToRdf:700-741)."""
    from xmltoldmigration_spark.kg.migrators import (
        corporation,
        lineage,
        office,
        outline,
        person,
        place,
        imagegroup,
        product,
        pubinfo,
        taxonomy,
        topic,
        work,
    )

    root = ET.fromstring(content)
    dispatch = {
        "person": person.migrate,
        "topic": topic.migrate,
        "office": office.migrate,
        "corporation": corporation.migrate,
        "place": place.migrate,
        "lineage": lineage.migrate,
        "work": work.migrate,
        "outline": outline.migrate,
        "product": product.migrate,
        "pubinfo": pubinfo.migrate,
        "imagegroup": imagegroup.migrate,
        "taxonomy": taxonomy.migrate,
    }
    fn = dispatch.get(rtype)
    if fn is None:
        raise ValueError(f"unknown record type {rtype!r}")
    return fn(root, ctx)
