"""Vectorized parse stage: src table -> tagged output rows (stage 1).

One Arrow-native mapInArrow pass replaces the reference's per-type
sequential migrators (MigrationApp.migrateType:572-638).  Each input
record is record-local (SURVEY.md §3.2), so the stage is embarrassingly
parallel; mega-records (outlines emitting 1e4+ triples) are bounded by
spark.sql.execution.arrow.maxRecordsPerBatch and by chunked yields here.

Output is a single tagged union (column `stream`) so one scan feeds all
downstream stages:

    stream='triple'     graph/subject/predicate/o_kind/o_value/o_lang/o_datatype
    stream='symmetric'  subject=dest RID, predicate=prop local, o_value=src RID
    stream='error'      subject=rid, predicate=etype, o_value=message
    stream='link'       subject=src rid, predicate=prop, o_value=dst rid
    stream='status'     subject=rid, o_value=status           (J3 input)
    stream='redirect'   subject=old rid, o_value=new rid      (J1 runtime input)
    stream='content'    subject=id, o_value=text              (K3 side outputs)
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

PARSED_SCHEMA = (
    "stream string, graph string, subject string, predicate string, "
    "o_kind string, o_value string, o_lang string, o_datatype string"
)

_CHUNK = 20000


_REPO_PATH = __file__.rsplit("/xmltoldmigration_spark/", 1)[0]


_COLS = list(PARSED_SCHEMA.replace(" string", "").split(", "))


def _parse_record(path: str, content, out: list) -> None:
    """Parse ONE record into tagged output tuples appended to `out`.

    `content` may be str or bytes — ElementTree accepts both, and the
    Arrow path hands in a zero-decode bytes view of the record."""
    from xmltoldmigration_spark.kg.common import Ctx
    from xmltoldmigration_spark.kg.migrators import migrate_record
    from xmltoldmigration_spark.sources.corpus import rtype_from_path

    rid = path.rsplit("/", 1)[-1].removesuffix(".xml")
    ctx = Ctx(app_mode=True, src_path=path)
    try:
        rtype = rtype_from_path(path)
        emitters = migrate_record(rtype, content, ctx)
    except Exception as e:  # record-level failure -> error row
        out.append(("error", rid, rid, "parse", None, f"{type(e).__name__}: {e}", None, None))
        return
    # status was captured during migrate_record — no second parse
    out.append(("status", rid, rid, None, None, ctx.result.status, None, None))
    for em in emitters:
        for (g, s, p, k, v, lang, dt) in em.rows():
            out.append(("triple", g, s, p, k, v, lang, dt))
    for (dest, prop, src) in ctx.result.symmetric:
        out.append(("symmetric", dest, dest, prop, None, src, None, None))
    for (etype, erid, sub, prop, msg) in ctx.result.errors:
        out.append(("error", erid, sub, etype + ":" + (prop or ""), None, msg, None, None))
    for (src, prop, dst) in ctx.result.links:
        out.append(("link", rid, src, prop, None, dst, None, None))
    for (kind, payload) in ctx.result.contents:
        if kind == "ridReplacement":
            old, _, new = payload.partition(",")
            out.append(("redirect", rid, old, None, None, new, None, None))
        else:
            out.append(("content", rid, kind, None, None, payload, None, None))


def _parse_batches(batches):
    """Arrow-native batch iterator: pa.RecordBatch in -> pa.RecordBatch out.

    Bandwidth discipline (the 32-wide wall is memory-bound, BENCH.md):
    - record XML stays in the incoming Arrow buffer until ElementTree
      needs it — the string column is viewed as binary (zero-copy cast)
      and each record materializes ONE bytes object at a time, parsed and
      freed before the next, instead of the old mapInPandas shape where
      the whole batch's contents became resident Python strings inside a
      pandas object block (plus a utf-8 decode pass per record);
    - output rows build Arrow string arrays directly (one zip pass over
      the tuple list -> pa.array), skipping the tuple-list -> pandas
      object DataFrame -> Arrow re-conversion round trip.
    """
    # executor-side workers don't inherit the driver's sys.path mutations;
    # mapInArrow closures are cloudpickled by value, so this nested-module
    # import pattern keeps the package importable on any worker
    import sys

    if _REPO_PATH not in sys.path:
        sys.path.insert(0, _REPO_PATH)
    import pyarrow as pa

    out: list[tuple] = []

    def flush():
        # slice into <=_CHUNK batches: a mega-record (outline with 1e4-1e5
        # nodes, SURVEY §7.3) can emit more rows than _CHUNK from a single
        # record, and one oversized Arrow batch is exactly the per-batch
        # memory spike the chunking exists to prevent
        nonlocal out
        while out:
            chunk, out = out[:_CHUNK], out[_CHUNK:]
            yield pa.RecordBatch.from_arrays(
                [pa.array(col, type=pa.string()) for col in zip(*chunk)], names=_COLS
            )

    for rb in batches:
        paths = rb.column(0)
        contents = rb.column(1)
        if pa.types.is_string(contents.type):
            contents = contents.cast(pa.binary())  # zero-copy view
        elif pa.types.is_large_string(contents.type):
            contents = contents.cast(pa.large_binary())
        for i in range(rb.num_rows):
            _parse_record(paths[i].as_py(), contents[i].as_py(), out)
            if len(out) >= _CHUNK:
                yield from flush()
    yield from flush()


def parse_src(src: DataFrame) -> DataFrame:
    """src(repo,path,commit,lang,content) -> tagged parse output."""
    repo = _REPO_PATH

    def run(batches):
        import sys

        if repo not in sys.path:
            sys.path.insert(0, repo)
        from xmltoldmigration_spark.kg.parse import _parse_batches

        return _parse_batches(batches)

    return src.select("path", "content").mapInArrow(run, schema=PARSED_SCHEMA)


def split_streams(parsed: DataFrame) -> dict[str, DataFrame]:
    """Split the tagged union into per-stream DataFrames.

    Caller should persist `parsed` first so each filter doesn't re-run the
    parse (plans/pipeline.py checkpoints it to parquet, which also gives
    resumability)."""
    from pyspark.sql import functions as F

    out = {}
    out["triples"] = parsed.filter(F.col("stream") == "triple").select(
        "graph", "subject", "predicate", "o_kind", "o_value", "o_lang", "o_datatype"
    )
    out["symmetric"] = parsed.filter(F.col("stream") == "symmetric").select(
        F.col("subject").alias("dest_rid"),
        F.col("predicate").alias("prop"),
        F.col("o_value").alias("src_rid"),
    )
    out["errors"] = parsed.filter(F.col("stream") == "error").select(
        F.col("graph").alias("rid"),
        F.col("subject").alias("sub_rid"),
        F.col("predicate").alias("etype"),
        F.col("o_value").alias("message"),
    )
    out["links"] = parsed.filter(F.col("stream") == "link").select(
        F.col("subject").alias("src_rid"),
        F.col("predicate").alias("prop"),
        F.col("o_value").alias("dst_rid"),
    )
    out["statuses"] = parsed.filter(F.col("stream") == "status").select(
        F.col("subject").alias("rid"), F.col("o_value").alias("status")
    )
    out["redirects"] = parsed.filter(F.col("stream") == "redirect").select(
        F.col("subject").alias("old_rid"), F.col("o_value").alias("new_rid")
    )
    out["contents"] = parsed.filter(F.col("stream") == "content").select(
        F.col("graph").alias("rid"),
        F.col("subject").alias("kind"),
        F.col("o_value").alias("payload"),
    )
    return out
