"""EAP transfer — reference: EAPTransfer.java:82-337 (S5).

One eap.csv row -> instance (bdr:MWEAP…), optional abstract work
(bdr:WAEAP…), image instance (bdr:WEAP…) with its single image group and
IIIF manifest.  Test config: normalizeOneDirection(false, false)
(EAPTest.java:29) — both directions of every symmetric pair are kept.
"""

from __future__ import annotations

from xmltoldmigration_spark.kg import common as C
from xmltoldmigration_spark.kg.common import Ctx
from xmltoldmigration_spark.kg.model import (
    ADM,
    BDA,
    BDO,
    BDR,
    RDF_TYPE,
    RDFS,
    SKOS,
    XSD,
    Emitter,
    boolean,
    integer,
    iri,
    lit,
)

ORIG_URL_BASE = "https://eap.bl.uk/archive-file/"

_SCRIPTS = {"Newa": "ScriptNewa", "Ranj": "ScriptRanj", "Beng": "ScriptBeng"}
_LANGS = {"san": ["LangSa"], "new": ["LangNew"], "san;new": ["LangNew", "LangSa"]}


def rkts_to_bdr(ctx: Ctx, rkts: str, indic_version: bool) -> str | None:
    """EAPTransfer.rKTsToBDR:125-142 via abstract-rkts.csv."""
    if not rkts or "?" in rkts:
        return None
    # abstract-rkts.csv maps WA rid -> rKTs id; the transfer needs the
    # inverse keyed on the rKTs id (cached on the Authority object)
    wa = ctx.auth.rkts_to_wa(rkts)
    if wa is not None:
        return wa
    rktsid = rkts[1:]
    if not rktsid.isdigit():
        return None
    prefix = "WA0RK" if rkts.startswith("K") else "WA0RT"
    return prefix + ("I" if indic_version else "") + rktsid


def resources_from_line(line: list[str], ctx: Ctx) -> list[Emitter]:
    base_rid = line[2].replace("/", "-")
    rid = "W" + base_rid
    em = Emitter(graph="M" + rid)
    work = C.create_root(em, BDR + "M" + rid, BDO + "Instance")
    emitters = [em]

    abstract_rid = rkts_to_bdr(ctx, line[15], True)
    em_a = None
    work_a = None
    if abstract_rid is None:
        abstract_rid = "WA" + base_rid
        em_a = Emitter(graph=abstract_rid)
        work_a = C.create_root(em_a, BDR + abstract_rid, BDO + "Work")
        adm_a = C.create_admin_root(em_a, work_a)
        emitters.append(em_a)
        em.add(work, BDO + "instanceOf", iri(work_a))
        em_a.add(work_a, BDO + "workHasInstance", iri(work))
        C.add_released(em_a, adm_a)
        em_a.add(adm_a, ADM + "metadataLegal", iri(BDA + "LD_EAP_metadata"))
    else:
        C.add_symmetric_property(ctx, em, "instanceOf", "M" + rid, abstract_rid)

    adm = C.create_admin_root(em, work)
    C.add_released(em, adm)
    em.add(adm, ADM + "metadataLegal", iri(BDA + "LD_EAP_metadata"))
    orig_url = ORIG_URL_BASE + base_rid
    em.add(adm, ADM + "originalRecord", lit(orig_url, None, XSD + "anyURI"))

    # title
    title = line[12]
    title_lang = "sa-x-iast"
    if title.endswith("@en"):
        title = title[:-3]
        title_lang = "en"
    else:
        node = em.facet_node(C.FACET_TITLE, BDO + "Title")
        em.add(work, BDO + "hasTitle", iri(node))
        em.add(node, RDFS + "label", lit(title, title_lang))
    em.add(work, SKOS + "prefLabel", lit(title, title_lang))
    if work_a is not None:
        em_a.add(work_a, SKOS + "prefLabel", lit(title, title_lang))

    # copy event (plain xsd:integer years, EAPTransfer.java:201-212)
    if line[3]:
        start, end = int(line[3]), int(line[4])
        event = C.get_event(em, work, "CopyEvent", "instanceEvent", reuse=True)
        if start == end:
            em.add(event, BDO + "onYear", integer(start))
        else:
            em.add(event, BDO + "notBefore", integer(start))
            em.add(event, BDO + "notAfter", integer(end))

    # note
    note_text = line[8]
    if line[13]:
        note_text += ", date: " + line[13]
    note_text += ", recordID: " + line[0] + ", MDARK: " + line[7]
    node = em.facet_node(C.FACET_NOTE, BDO + "Note")
    em.add(work, BDO + "note", iri(node))
    em.add(node, BDO + "noteText", lit(note_text, "en"))
    em.add(work, BDO + "printMethod", iri(BDR + "PrintMethod_Manuscript"))

    em.add(work, BDO + "script", iri(BDR + _SCRIPTS.get(line[6], "ScriptDeva")))
    for lang in _LANGS.get(line[5], []):
        if work_a is not None:
            em_a.add(work_a, BDO + "language", iri(BDR + lang))
        em.add(work, BDO + "language", iri(BDR + lang))
    if line[5] == "tib" and work_a is not None:
        em_a.add(work_a, BDO + "language", iri(BDR + "LangBo"))
    if line[9]:
        em.add(work, BDO + "dimWidth", lit(line[9], None, XSD + "decimal"))
    if line[10]:
        em.add(work, BDO + "dimHeight", lit(line[10], None, XSD + "decimal"))
    if work_a is not None:
        if len(line) > 16 and line[16]:
            for t in line[16].split(","):
                em_a.add(work_a, BDO + "workIsAbout", iri(BDR + t))
        if len(line) > 17 and line[17]:
            for g in line[17].split(","):
                em_a.add(work_a, BDO + "workGenre", iri(BDR + g))
    em.add(work, BDO + "material", iri(BDR + "MaterialPaper"))

    # image instance + volume
    item_rid = "W" + base_rid
    it_em = Emitter(graph=item_rid)
    item = C.create_root(it_em, BDR + item_rid, BDO + "ImageInstance")
    emitters.append(it_em)
    it_em.add(item, BDO + "inCollection", iri(BDR + "PR0EAP676"))
    if ctx.add_work_has_item:
        em.add(work, BDO + "instanceHasReproduction", iri(BDR + item_rid))
    adm_item = C.create_admin_root(it_em, item)
    C.add_status(it_em, adm_item, "released")
    it_em.add(adm_item, ADM + "access", iri(BDA + "AccessOpen"))
    it_em.add(adm_item, ADM + "restrictedInChina", boolean(False))
    it_em.add(adm_item, ADM + "contentLegal", iri(BDA + "LD_EAP_content"))
    it_em.add(adm_item, ADM + "metadataLegal", iri(BDA + "LD_EAP_metadata"))

    volume_rid = "I0" + item_rid[1:]
    volume = BDR + volume_rid
    it_em.add(volume, RDF_TYPE, iri(BDO + "ImageGroup"))
    if ctx.add_volume_of:
        it_em.add(volume, BDO + "volumeOf", iri(item))
    if ctx.add_item_has_volume:
        it_em.add(item, BDO + "instanceHasVolume", iri(volume))
    it_em.add(volume, BDO + "hasIIIFManifest", iri(orig_url + "/manifest"))
    it_em.add(volume, BDO + "volumeNumber", integer(1))
    if ctx.add_item_for_work:
        it_em.add(item, BDO + "instanceReproductionOf", iri(BDR + "M" + rid))
        if work_a is not None:
            em_a.add(work_a, BDO + "workHasInstance", iri(BDR + item_rid))
            it_em.add(item, BDO + "instanceOf", iri(BDR + abstract_rid))
        else:
            C.add_symmetric_property(ctx, it_em, "instanceOf", item_rid, abstract_rid)
    return emitters
