"""Golden-corpus parity: every implemented migrator must reproduce the
reference's triples at P/R >= 0.95 (BASELINE.json north_rule; we assert
1.0 for implemented types).

Corpus: /root/reference/src/test/xml ↔ src/test/ttl, the same pairs
MigrationTest.java asserts graph isomorphism on (SURVEY.md §5).  Facet
IRIs are canonicalized by content signature (kg/compare.py) exactly as
the reference's oracle treats them (isomorphism, not string equality).
"""

from __future__ import annotations

from pathlib import Path

import pytest

XML_DIR = Path("/root/reference/src/test/xml")

pytestmark = pytest.mark.skipif(
    not XML_DIR.exists(), reason="reference golden corpus not present"
)

# fixture name -> record type; extended as migrators land
IMPLEMENTED = {
    "P1331": "person",
    "P1583": "person",
    "G488": "place",
    "G844": "place",
    "TopicTest": "topic",
    "OfficeTest": "office",
    "CorporationTest": "corporation",
    "L8LS14115": "lineage",
    "WorkTestFPL": "work",
    "PubinfoTest": "pubinfo",
    "ImagegroupTest": "imagegroup",
    "PR99NCUL01": "product",
    "PR1CTC17": "product",
    "withdrawn-test": "office",
    "OutlineTest": "outline",
    "TaxonomyTest": "taxonomy",
    "EtextTest": "etext",
    "W1FEMC010006": "work",
    "W1FEMC020013": "work",
}

# ScanrequestTest.ttl is stale golden data: the reference itself has the
# isomorphism assert commented out (MigrationTest.java:447) and its
# migrator is a no-op (ScanrequestMigration.java:44-55).


@pytest.mark.parametrize("name", sorted(IMPLEMENTED))
def test_fixture_parity(name):
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from fixture_diff import run_fixture

    pr, _ = run_fixture(name, IMPLEMENTED[name])
    assert pr.precision == 1.0 and pr.recall == 1.0, (
        f"{name}: P={pr.precision:.3f} R={pr.recall:.3f}\n"
        f"missing={pr.missing[:5]}\nextra={pr.extra[:5]}"
    )


def test_per_row_sha256_equality():
    """BASELINE.json input_hint: per-row content sha256 equality.

    Rows = canonical N-Triples-style serializations of the canonicalized
    triple sets; for every implemented fixture the sorted row-stream of
    our output hashes identically to the golden's."""
    import hashlib
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from fixture_diff import TTL_DIR, XML_DIR, run_fixture

    from xmltoldmigration_spark.kg.compare import canonicalize
    from xmltoldmigration_spark.kg.ttl import parse_ttl_file

    def rows_sha256(triples):
        canon = sorted(canonicalize(triples))
        h = hashlib.sha256()
        for row in canon:
            h.update(repr(row).encode("utf-8"))
        return h.hexdigest()

    for name, rtype in sorted(IMPLEMENTED.items()):
        pr, ctx = run_fixture(name, rtype)
        # reconstruct both sides the same way the P/R check does
        from xmltoldmigration_spark.kg.authority import get_authority
        from xmltoldmigration_spark.kg.common import Ctx
        from xmltoldmigration_spark.kg.migrators import migrate_record

        content = (XML_DIR / f"{name}.xml").read_text(encoding="utf-8")
        c = Ctx(auth=get_authority(test_mode=True))
        ours = []
        for em in migrate_record(rtype, content, c):
            ours.extend(
                (s, p, k, v, lang, dt) for (_, s, p, k, v, lang, dt) in em.rows()
            )
        if rtype == "etext":
            golden = parse_ttl_file(str(TTL_DIR / f"{name}-etext.ttl"))
            golden += parse_ttl_file(str(TTL_DIR / f"{name}-item.ttl"))
        else:
            golden = parse_ttl_file(str(TTL_DIR / f"{name}.ttl"))
        assert rows_sha256(ours) == rows_sha256(golden), name


def test_etext_content_nopages_golden():
    """MigrationTest.java:546-556: migrating EtextTest.xml with
    isPaginated=false must produce EtextTest-content-noPages.txt
    byte-exactly (the reference compares against correctContent.trim())."""
    import xml.etree.ElementTree as ET

    from xmltoldmigration_spark.kg.authority import get_authority
    from xmltoldmigration_spark.kg.common import Ctx
    from xmltoldmigration_spark.kg.migrators import etext as etext_mod
    from xmltoldmigration_spark.kg.model import BDA, BDR

    xml_path = XML_DIR / "EtextTest.xml"
    golden = (XML_DIR.parent / "ttl" / "EtextTest-content-noPages.txt").read_text(
        encoding="utf-8"
    )
    root = ET.fromstring(xml_path.read_text(encoding="utf-8"))
    ctx = Ctx(auth=get_authority(test_mode=True))
    _, _, content = etext_mod.migrate_one_etext(
        root, ctx,
        is_paginated=False,
        needs_page_name_translation=False,
        provider_uri=BDA + "CP001",
        collection_uri=BDR + "PR0ET001",
        first=True,
        test_mode=True,
    )
    assert content == golden.strip()


def test_split_items_modes():
    """WorkMigration.splitItems (java:56; MigrationTest.java:75 pins
    false): with split_items=True (production default) FPL items and
    pubinfo holdings become separate IT* graphs; with False their triples
    merge into the instance's own graph.  The triple SET is identical
    either way — only the graph routing differs."""
    from xmltoldmigration_spark.kg.authority import get_authority
    from xmltoldmigration_spark.kg.common import Ctx
    from xmltoldmigration_spark.kg.migrators import migrate_record

    for name, rtype in (("WorkTestFPL", "work"), ("PubinfoTest", "pubinfo")):
        content = (XML_DIR / f"{name}.xml").read_text(encoding="utf-8")

        def run(split):
            ctx = Ctx(auth=get_authority(test_mode=True), split_items=split)
            ems = migrate_record(rtype, content, ctx)
            rows = [(g, s, p, k, v, lang, dt)
                    for em in ems for (g, s, p, k, v, lang, dt) in em.rows()]
            return ems, rows

        ems_split, rows_split = run(True)
        ems_merged, rows_merged = run(False)
        it_graphs_split = {em.graph for em in ems_split if em.graph.startswith("IT")}
        it_graphs_merged = {em.graph for em in ems_merged if em.graph.startswith("IT")}
        assert it_graphs_split and not it_graphs_merged, name
        # same triples, different graph routing
        assert {r[1:] for r in rows_split} == {r[1:] for r in rows_merged}, name
        # merged mode: the item root triples live in a non-IT graph
        item_rows = [r for r in rows_merged if r[1].rsplit("/", 1)[-1].startswith("IT")]
        assert item_rows and all(not r[0].startswith("IT") for r in item_rows), name
