"""GRETIL transfer — reference: GRETILTransfer.java:42-175 (S5).

Reference quirks preserved: adm:status is asserted on the WORK resource
itself (java:119 addStatus(mA, workA, ...)), and the creator call is a
no-op (java:152 passes workA in the `work` slot of addAgentAsCreator, so
neither branch fires).
"""

from __future__ import annotations

from xmltoldmigration_spark.kg import common as C
from xmltoldmigration_spark.kg.common import Ctx
from xmltoldmigration_spark.kg.model import (
    ADM,
    BDA,
    BDO,
    BDR,
    RDFS,
    SKOS,
    XSD,
    Emitter,
    iri,
    lit,
)
from xmltoldmigration_spark.kg.transfers.eap import rkts_to_bdr

ORIG_URL_BASE = "http://gretil.sub.uni-goettingen.de/gretil.html"


def resources_from_line(line: list[str], ctx: Ctx) -> list[Emitter]:
    em = Emitter(graph=line[0])
    work = C.create_root(em, BDR + line[0], BDO + "EtextInstance")
    adm = C.create_admin_root(em, work)
    emitters = [em]

    abstract_rid = None
    rkts = line[2]
    if rkts:
        if "," in rkts:
            rkts = rkts[: rkts.index(",")]
        abstract_rid = rkts_to_bdr(ctx, line[2], True)
    em_a = None
    work_a = None
    if abstract_rid is not None:
        C.add_symmetric_property(ctx, em, "instanceOf", line[0], abstract_rid)
    else:
        abstract_rid = "WA" + line[0][2:]
        em_a = Emitter(graph=abstract_rid)
        work_a = C.create_root(em_a, BDR + abstract_rid, BDO + "Work")
        emitters.append(em_a)
        em.add(work, BDO + "instanceOf", iri(work_a))
        em_a.add(work_a, BDO + "workHasInstance", iri(work))
        em_a.add(work_a, ADM + "status", iri(BDA + "StatusReleased"))  # quirk
        adm_a = C.create_admin_root(em_a, work_a)
        C.add_released(em_a, adm_a)
        em_a.add(adm_a, ADM + "metadataLegal", iri(BDA + "LD_GRETIL"))

    C.add_released(em, adm)
    em.add(adm, ADM + "metadataLegal", iri(BDA + "LD_GRETIL"))
    em.add(adm, ADM + "access", iri(BDA + "AccessOpen"))
    if line[8]:
        orig = ORIG_URL_BASE + line[8].replace("/", "-")
        em.add(adm, ADM + "originalRecord", lit(orig, None, XSD + "anyURI"))
    em.add(work, BDO + "inCollection", iri(BDR + "PR0GR01"))

    em.add(work, SKOS + "prefLabel", lit(line[1], "en"))
    em.add(work, SKOS + "altLabel", lit(line[3], "sa-x-iast"))
    if work_a is not None:
        em_a.add(work_a, SKOS + "prefLabel", lit(line[1], "en"))
        em_a.add(work_a, SKOS + "altLabel", lit(line[3], "sa-x-iast"))
    node = em.facet_node(C.FACET_TITLE, BDO + "Title")
    em.add(work, BDO + "hasTitle", iri(node))
    em.add(node, RDFS + "label", lit(line[1], "en"))

    # creators: no-op in the reference (see module docstring)

    topic = line[6]
    if topic and work_a is not None and topic.startswith("T"):
        em_a.add(work_a, BDO + "workIsAbout", iri(BDR + topic))

    for idx, prefix in ((9, "Input by "), (10, "Based on ")):
        note = line[idx]
        if note:
            n = em.facet_node(C.FACET_NOTE, BDO + "Note")
            em.add(work, BDO + "note", iri(n))
            em.add(n, BDO + "noteText", lit(prefix + note, "en"))
    return emitters
