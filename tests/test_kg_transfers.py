"""CSV-transfer parity vs the one-line golden fixtures
(src/test/{eap,cudl,gretil,nsi,hodgson}test.csv ↔ matching TTLs;
EAPTest/CUDLTest/GretilTest/NSITest/HodgsonTest.java).  All transfer
tests run with normalizeOneDirection(false, false)."""

from __future__ import annotations

import csv
from pathlib import Path

import pytest

TEST_DIR = Path("/root/reference/src/test")

pytestmark = pytest.mark.skipif(
    not TEST_DIR.exists(), reason="reference corpus not present"
)

# (module, line index) — NSI/Hodgson fixtures carry a header row
# (NSITest.java:37-39, HodgsonTest.java:38-40)
CASES = {
    "eaptest": ("eap", 0),
    "cudltest": ("cudl", 0),
    "gretiltest": ("gretil", 0),
    "nsitest": ("nsi", 1),
    "hodgsontest": ("hodgson", 1),
}


@pytest.mark.parametrize("fixture", sorted(CASES))
def test_transfer_parity(fixture):
    import importlib

    from xmltoldmigration_spark.kg.authority import get_authority
    from xmltoldmigration_spark.kg.common import Ctx
    from xmltoldmigration_spark.kg.compare import precision_recall
    from xmltoldmigration_spark.kg.ttl import parse_ttl_file

    mod_name, line_idx = CASES[fixture]
    mod = importlib.import_module(f"xmltoldmigration_spark.kg.transfers.{mod_name}")
    rows = list(csv.reader(open(TEST_DIR / f"{fixture}.csv", encoding="utf-8")))
    line = rows[line_idx]
    ctx = Ctx(auth=get_authority(test_mode=True), one_direction=False, prefer_many=False)
    emitters = mod.resources_from_line(line, ctx)
    ours = []
    for em in emitters:
        ours.extend((s, p, k, v, lang, dt) for (_, s, p, k, v, lang, dt) in em.rows())
    golden = parse_ttl_file(str(TEST_DIR / "ttl" / f"{fixture}.ttl"))
    pr = precision_recall(ours, golden)
    assert pr.precision == 1.0 and pr.recall == 1.0, (
        f"{fixture}: P={pr.precision:.3f} R={pr.recall:.3f}\n"
        f"missing={pr.missing[:5]}\nextra={pr.extra[:5]}"
    )
