"""The KG-construction pipeline: parse -> link -> symmetric -> canonicalize
-> write, with per-stage checkpointing and resume (SURVEY.md §3.4).

Each stage materializes to parquet under `out_dir/<stage>/` and records a
lineage row (stage, partitions, rows, value hash, wall seconds) in
`out_dir/_lineage/`.  A `_DONE` marker makes the stage skippable: rerunning
the pipeline after a failure resumes mid-pipeline (north_rule
resumability), because every stage is a pure function of the previous
stage's parquet + the deterministic authority tables.

Scale notes (100 TB / 1000 executors):
- stage 1 (parse) is shuffle-free mapInArrow over the Iceberg scan;
  partition pruning on record type comes free from the `path` predicate.
- stages 2-4 shuffle only the narrow columns they join on; all authority
  joins are broadcast (< 100 MB side).
- the triple table is written partitioned by rdf-type group and hash
  bucket over subject (the reference's own md5-sharding, SURVEY §1.2),
  so downstream per-entity reads prune to one bucket.
- AQE handles skew (hot objects like bdr:LangBo); the symmetric-completion
  aggregation is a two-phase hash aggregate by construction
  (dropDuplicates = partial + final).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmltoldmigration_spark.kg.parse import parse_src, split_streams

N_SUBJECT_BUCKETS = 64


def _authority_rep_pairs() -> list[tuple[str, str]]:
    """(node, representative) pairs for the STATIC authority duplicate
    clusters, representative = min reachable id (same semantics as
    operators/connected_components.py), node != comp only.

    Computed once per process with a driver-side union-find: the input is
    the shipped cluster CSVs (CommonMigration.java:152-157), fixed at
    build time and ~38k pairs — there is nothing distributed about it.
    """
    global _AUTH_REP_CACHE
    if _AUTH_REP_CACHE is not None:
        return _AUTH_REP_CACHE
    from xmltoldmigration_spark.kg.authority import get_authority

    pairs = list(get_authority().clusters.items())
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = {n for p in pairs for n in p}
    _AUTH_REP_CACHE = [
        (n, find(n)) for n in sorted(nodes) if find(n) != n
    ]
    return _AUTH_REP_CACHE


_AUTH_REP_CACHE: list[tuple[str, str]] | None = None


class Pipeline:
    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out = Path(out_dir)
        self.out.mkdir(parents=True, exist_ok=True)
        (self.out / "_lineage").mkdir(exist_ok=True)

    # ------------------------------------------------------------ plumbing

    def _stage_dir(self, name: str) -> Path:
        return self.out / name

    def _done(self, name: str) -> bool:
        return (self._stage_dir(name) / "_DONE").exists()

    def _write_stage(self, name: str, df: DataFrame, partition_by: list[str] | None = None,
                     co_scheduled: bool = False):
        t0 = time.time()
        path = str(self._stage_dir(name))
        # lineage metrics ride along with the write via observe() — row
        # count + order-insensitive content hash (bit_xor of row hashes,
        # partition-order invariant) at zero extra passes
        from pyspark.sql import Observation

        obs = Observation(f"lineage_{name}")
        observed = df.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.expr("bit_xor(xxhash64(" + ", ".join(df.columns) + "))").alias("value_hash"),
        )
        writer = observed.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        stats = obs.get
        written = self.spark.read.parquet(path)
        # per-partition lineage (north_rule): row count per output file read
        # straight from the parquet FOOTERS — no second scan of the data
        # pages (on a cluster the same metadata comes from the FileSystem
        # API / Iceberg manifest; here pyarrow reads each footer locally)
        import pyarrow.parquet as pq
        from concurrent.futures import ThreadPoolExecutor

        all_files = sorted(
            p for p in Path(path).rglob("*.parquet") if not p.name.startswith(".")
        )
        part_files = all_files[:512]

        def _footer(p):
            return {"file": p.name, "rows": pq.ParquetFile(p).metadata.num_rows}

        # footer reads are I/O-bound; a small pool keeps this out of the
        # per-stage serial component
        with ThreadPoolExecutor(max_workers=8) as ex:
            per_file = list(ex.map(_footer, part_files))
        lineage = {
            "stage": name,
            "rows": stats["rows"],
            "value_hash": str(stats["value_hash"]),
            "wall_s": round(time.time() - t0, 3),
            "partitions": per_file,
        }
        # side stages submitted concurrently with the main graph write:
        # wall_s is ELAPSED under core-sharing (includes scheduler wait),
        # not the stage's exclusive cost — mark it so lineage consumers
        # don't read co-scheduled elapsed time as per-stage work
        if co_scheduled:
            lineage["co_scheduled"] = True
        # At cluster scale a stage writes thousands of files; the per-file
        # list keeps the first 512 but the truncation is MARKED (total file
        # count + remainder row sum) so lineage consumers never mistake the
        # sample for the whole write.
        if len(all_files) > 512:
            rest = all_files[512:]
            with ThreadPoolExecutor(max_workers=8) as ex:
                rest_rows = sum(r["rows"] for r in ex.map(_footer, rest))
            lineage["truncated"] = True
            lineage["n_files_total"] = len(all_files)
            lineage["rows_in_unlisted_files"] = rest_rows
        with open(self.out / "_lineage" / f"{name}.json", "w") as f:
            json.dump(lineage, f)
        (self._stage_dir(name) / "_DONE").touch()
        return written

    def _read_stage(self, name: str) -> DataFrame:
        return self.spark.read.parquet(str(self._stage_dir(name)))

    def lineage(self) -> list[dict]:
        rows = []
        for p in sorted((self.out / "_lineage").glob("*.json")):
            rows.append(json.loads(p.read_text()))
        return rows

    # ------------------------------------------------------------ stages

    def run(self, src: DataFrame, resume: bool = True,
            materialize: str = "minimal",
            extra_parsed: DataFrame | None = None) -> DataFrame:
        """materialize='minimal' (default): stages 2-5 fuse into ONE
        write — Catalyst pipelines the narrow joins/dedups, and per-stage
        lineage still lands via observe() points inside the single plan.
        Materializing every stage ('all') quadruples the I/O on the full
        triple set, which is the single-node bottleneck (each pass writes
        the whole table); at cluster scale the same fusion argument holds
        per-executor.  Resume granularity: parsed + graph ('minimal') or
        every stage ('all')."""
        # stage 1: PARSE (record-local, no shuffle)
        if resume and self._done("parsed"):
            parsed = self._read_stage("parsed")
        else:
            parsed = parse_src(src)
            # seed graphs from CSV transfer sources (e.g. the FEMC works
            # seed the reference runs ahead of the XML work migration,
            # MigrationApp.java:758) union in before the stage write
            if extra_parsed is not None:
                parsed = parsed.unionByName(extra_parsed)
            # partition the tagged union by stream: every downstream
            # stage filters on exactly one stream value, so the filter
            # becomes partition PRUNING — the triple chain reads only
            # triple files, the error/dangling/conflict side tables read
            # only their (tiny) streams instead of re-scanning the full
            # parse output
            parsed = self._write_stage("parsed", parsed, partition_by=["stream"])
        streams = split_streams(parsed)
        # the set of migrated graphs is invariant through link/admin/
        # backlink stages (they only rewrite objects or add rows into
        # graphs that already exist), so compute it ONCE from the parsed
        # triples — a single column-pruned scan of the parse output —
        # and reuse it in every existence semi/anti-join.  Without this
        # each `.distinct()` re-executed the whole join chain (3 extra
        # full-chain runs per pipeline).  localCheckpoint materializes
        # the small list on first use.
        cores = self.spark.sparkContext.defaultParallelism
        # eager ONLY when side-table jobs will actually run CONCURRENTLY
        # with the main graph write (>=4 cores AND at least one side stage
        # pending): two threads racing to materialize one lazy checkpoint
        # would compute it twice.  On a fully-warm resume (graph + all
        # sides done) nothing consumes `graphs`, so an unconditional eager
        # checkpoint would pay a full distinct-over-parse job per call —
        # measured as the dominant per-query cost of warm kg bench runs.
        sides_pending = [
            s for s in ("errors", "dangling", "conflicts")
            if not (resume and self._done(s))
        ]
        graphs = (
            streams["triples"].select("graph").distinct()
            .localCheckpoint(eager=cores >= 4 and bool(sides_pending))
        )

        def _run_main() -> DataFrame:
            if materialize == "all":
                # stage 2: LINK (J1 runtime redirects + J13 admin
                # propagation + J14 etext back-links — same chain as the
                # fused path)
                if resume and self._done("linked"):
                    triples = self._read_stage("linked")
                else:
                    linked = self._link(streams)
                    linked = self._propagate_work_admin(linked, streams, graphs)
                    linked = self._etext_backlinks(linked, streams, graphs)
                    linked = self._resolve_etext_pages(linked, streams)
                    triples = self._write_stage("linked", linked)
                # stage 3: SYMMETRIC COMPLETION (A1)
                if resume and self._done("completed"):
                    triples = self._read_stage("completed")
                else:
                    triples = self._write_stage(
                        "completed",
                        self._complete_symmetric(triples, streams["symmetric"], graphs),
                    )
                # stage 4: CANONICALIZE (G1/G2)
                if resume and self._done("canonical"):
                    triples = self._read_stage("canonical")
                else:
                    triples = self._write_stage("canonical", self._canonicalize(triples))
                # stage 5: WRITE final graph table
                if resume and self._done("graph"):
                    return self._read_stage("graph")
                return self._write_stage(
                    "graph",
                    self._finalize(triples, streams["triples"]),
                    partition_by=["type_part"],
                )
            if resume and self._done("graph"):
                return self._read_stage("graph")
            from pyspark.sql import Observation

            triples = self._link(streams)
            triples = self._propagate_work_admin(triples, streams, graphs)
            triples = self._etext_backlinks(triples, streams, graphs)
            triples = self._resolve_etext_pages(triples, streams)
            obs_link = Observation("linked")
            triples = triples.observe(obs_link, F.count(F.lit(1)).alias("rows"))
            triples = self._complete_symmetric(triples, streams["symmetric"], graphs)
            obs_sym = Observation("completed")
            triples = triples.observe(obs_sym, F.count(F.lit(1)).alias("rows"))
            triples = self._canonicalize(triples)
            final = self._write_stage(
                "graph",
                self._finalize(triples, streams["triples"]),
                partition_by=["type_part"],
            )
            for name, obs in (("linked", obs_link), ("completed", obs_sym)):
                with open(self.out / "_lineage" / f"{name}.json", "w") as f:
                    json.dump({"stage": name, "rows": obs.get["rows"],
                               "fused": True}, f)
            return final

        # side tables (errors / dangling links / imagegroup conflicts):
        # independent of the triple chain — they derive from the parse
        # output alone, so a resumed run writes the SAME tables as a
        # fresh one.  At >= 4 cores they are SUBMITTED CONCURRENTLY with
        # the main graph write (a multi-tenant scheduler fills the main
        # job's straggler/single-partition gaps with their tiny tasks —
        # on a cluster these would be parallel job submissions from the
        # driver for the same reason).  At 1-2 cores they stay
        # sequential: a concurrent variant was measured at n=400k/
        # local[1] and inflated the three writes ~6x (347 s e2e vs
        # 267 s — interleaved small jobs thrash a single-threaded
        # scheduler and page cache).
        co = cores >= 4
        side_builders = {
            "errors": lambda: self._write_stage(
                "errors",
                streams["errors"].unionByName(self._error_sides(streams, graphs)),
                co_scheduled=co,
            ),
            "dangling": lambda: self._write_stage(
                "dangling", self._dangling(streams), co_scheduled=co),
            "conflicts": lambda: self._write_stage(
                "conflicts", self._imagegroup_conflicts(streams), co_scheduled=co),
        }
        side_thunks = [side_builders[s] for s in sides_pending]

        if cores >= 4 and side_thunks:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=1 + len(side_thunks)) as ex:
                f_main = ex.submit(_run_main)
                f_sides = [ex.submit(t) for t in side_thunks]
                final = f_main.result()
                for f in f_sides:
                    f.result()
        else:
            final = _run_main()
            for t in side_thunks:
                t()
        return final

    def _link(self, streams: dict) -> DataFrame:
        """J1: apply run-time discovered redirects (withdrawn records) to
        IRI objects.  The static ridReplacements table was already applied
        record-locally in the parse stage (MigrationHelpers.sanitizeRID)."""
        triples = streams["triples"]
        redirects = streams["redirects"].dropDuplicates(["old_rid"])
        bdr = "http://purl.bdrc.io/resource/"
        red = redirects.select(
            F.concat(F.lit(bdr), "old_rid").alias("_old_iri"),
            F.concat(F.lit(bdr), "new_rid").alias("_new_iri"),
        )
        # no broadcast hint: redirects are DATA-derived (withdrawn records
        # scale with the corpus, unlike the authority CSVs) — AQE still
        # picks a broadcast join when the side is actually small, without
        # risking a forced driver-side collect of an unbounded table
        return (
            triples.join(
                red,
                (triples.o_kind == "iri") & (triples.o_value == F.col("_old_iri")),
                "left",
            )
            .withColumn("o_value", F.coalesce("_new_iri", "o_value"))
            .drop("_old_iri", "_new_iri")
        )

    def _admin_frames(self, streams: dict):
        """(access, ric_all) derived from workAdmin content rows.

        ric ("restricted in China") is set unconditionally by the
        reference (WorkMigration.java:556-567) so it comes from the
        UNFILTERED admin rows — a "||1" payload (no access, ric set)
        still restricts the etext IE; the access-override join only
        cares about rows carrying an access value."""
        adm = "http://purl.bdrc.io/ontology/admin/"
        admin = (
            streams["contents"]
            .filter(F.col("kind").startswith("workAdmin:"))
            .select(
                F.concat(F.lit("IE"), F.expr("substring(substring(kind, 11), 2)")).alias("_ie"),
                F.split("payload", "\\|").alias("_p"),
            )
            .select(
                "_ie",
                F.col("_p")[0].alias("_access"),
                F.col("_p")[2].alias("_ric"),
            )
            # Deterministic per-_ie pick via WHOLE-ROW struct max: keeps an
            # access-bearing row over an empty-access one if a record ever
            # yields multiple workAdmin rows (dropDuplicates(["_ie"]) kept
            # an arbitrary row, making access/ric flap between runs), and
            # never fabricates an (_access, _ric) combination that exists
            # on no source row (independent per-column max() would).
            .groupBy("_ie")
            .agg(F.max(F.struct("_access", "_ric")).alias("_s"))
            .select("_ie", F.col("_s._access").alias("_access"),
                    F.col("_s._ric").alias("_ric"))
        )
        access = admin.filter(F.col("_access") != "").drop("_ric")
        ric_all = admin.filter(F.col("_ric") == "1").select(
            F.col("_ie").alias("graph"),
            F.concat(F.lit("http://purl.bdrc.io/admindata/"), "_ie").alias("subject"),
            F.lit(adm + "restrictedInChina").alias("predicate"),
            F.lit("lit").alias("o_kind"),
            F.lit("true").alias("o_value"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit("http://www.w3.org/2001/XMLSchema#boolean").alias("o_datatype"),
        )
        return access, ric_all

    def _propagate_work_admin(self, triples: DataFrame, streams: dict,
                              graphs: DataFrame) -> DataFrame:
        """J13: the work record's archiveInfo (access/ric) overrides the
        defaults the etext migrator wrote on its IE instance admin
        (EtextMigration.java:494-499 reads WorkMigration.workAccessMap).
        No broadcast hint anywhere: workAdmin rows are data-derived (one
        per migrated work) — AQE broadcasts when actually small."""
        adm = "http://purl.bdrc.io/ontology/admin/"
        access, ric_all = self._admin_frames(streams)
        out = (
            triples.join(
                access,
                (triples.graph == F.col("_ie"))
                & (triples.predicate == adm + "access"),
                "left",
            )
            .withColumn(
                "o_value",
                F.when(F.col("_access").isNotNull(), F.col("_access")).otherwise(
                    F.col("o_value")
                ),
            )
            .drop("_ie", "_access")
        )
        # only into IE graphs that actually exist; the dropped rows are
        # reported by _error_sides (run unconditionally, resume-safe)
        ric_rows = ric_all.join(graphs, "graph", "leftsemi")
        return out.unionByName(ric_rows)

    def _repro_rows(self, streams: dict, graph_prefix: str) -> DataFrame:
        """Candidate J14 back-link triples for one instance-graph prefix."""
        bdo = "http://purl.bdrc.io/ontology/core/"
        bdr = "http://purl.bdrc.io/resource/"
        repro = (
            streams["links"]
            .filter(F.col("prop") == "instanceHasReproduction")
            .select(F.col("dst_rid").alias("work_rid"))
            .dropDuplicates(["work_rid"])
        )
        return repro.select(
            F.concat(F.lit(graph_prefix), F.col("work_rid")).alias("graph"),
            F.concat(F.lit(bdr + graph_prefix), F.col("work_rid")).alias("subject"),
            F.lit(bdo + "instanceHasReproduction").alias("predicate"),
            F.lit("iri").alias("o_kind"),
            F.concat(
                F.lit(bdr + "IE"), F.expr("substring(work_rid, 2)")
            ).alias("o_value"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("o_datatype"),
        )

    def _etext_backlinks(self, triples: DataFrame, streams: dict,
                         graphs: DataFrame) -> DataFrame:
        """J14: the reference re-opens the work/image-instance files to
        add instanceHasReproduction links to the new etext instance
        (EtextMigration.addReproToInstance:344-371); here the etext's
        link rows become forward triples into the existing MW/W graphs.
        Rows targeting a missing graph are reported by _error_sides."""

        def into(graph_prefix: str):
            return self._repro_rows(streams, graph_prefix).join(
                graphs, "graph", "leftsemi"
            )

        # instance graph (bdr:M<rid>) and image-instance graph (bdr:<rid>)
        return triples.unionByName(into("M")).unionByName(into(""))

    def _page_join(self, streams: dict) -> DataFrame:
        """Page-image refs left-joined to the exploded imagegroup ondisk
        lists: (graph, subject, ig, img, orig, seq-or-null)."""
        from pyspark.sql.window import Window

        contents = streams["contents"]
        # imagegroup ondisk lists -> (ig, lowercase basename, 1-based seq);
        # entries without an extension are skipped WITHOUT consuming a
        # sequence number (java:883-886), hence row_number after the filter
        entries = (
            contents.filter(F.col("kind").startswith("imgmap:"))
            .select(F.expr("substring(kind, 8)").alias("ig"), "payload")
            .dropDuplicates(["ig"])
            .select("ig", F.posexplode(F.split("payload", r"\|")))
            .filter(F.col("col").contains("."))
            .select(
                "ig", "pos",
                F.lower(F.regexp_replace("col", r"\.[^.]*$", "")).alias("img"),
            )
        )
        w = Window.partitionBy("ig").orderBy("pos")
        imgmap = entries.select("ig", "img", F.row_number().over(w).alias("seq"))
        refs = (
            contents.filter(F.col("kind").startswith("pageimg:"))
            .select(
                F.expr("substring(kind, 9)").alias("graph"),
                F.split("payload", r"\|").alias("p"),
            )
            .select(
                "graph",
                F.col("p")[0].alias("subject"),
                F.col("p")[1].alias("ig"),
                F.col("p")[2].alias("img"),
                F.col("p")[3].alias("orig"),
            )
        )
        return refs.join(imgmap, ["ig", "img"], "left")

    def _resolve_etext_pages(self, triples: DataFrame, streams: dict) -> DataFrame:
        """App-mode etext page-name translation (EtextBodyMigration.java:
        108-120 + MigrationHelpers.getImgmapForImggrp:857-891): UCB-OCR
        etext pages carry image FILE NAMES; their seqNum is the image's
        1-based position in the source imagegroup's ondisk list.

        The reference re-opens the imagegroup XML per etext; here both
        sides ride the parse output's contents stream and meet in ONE
        distributed join — no record-local foreign-file reads.  Pages
        whose image is absent from the list become ET_GEN error rows via
        _error_sides (java:116-117)."""
        bdo = "http://purl.bdrc.io/ontology/core/"
        resolved = self._page_join(streams).filter(F.col("seq").isNotNull()).select(
            "graph",
            "subject",
            F.lit(bdo + "seqNum").alias("predicate"),
            F.lit("lit").alias("o_kind"),
            F.col("seq").cast("string").alias("o_value"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit("http://www.w3.org/2001/XMLSchema#integer").alias("o_datatype"),
        )
        return triples.unionByName(resolved)

    def _error_sides(self, streams: dict, graphs: DataFrame) -> DataFrame:
        """Join-derived error rows (errors stream schema), computed from
        the parse output alone so they are identical whether the triple
        chain ran or was resumed from its markers:

        - workAdmin ric rows targeting a missing IE graph,
        - J14 back-links targeting a missing MW/W graph
          (EtextMigration.java:333-335,351-353 logs ET_GEN),
        - etext page images absent from their imagegroup's ondisk list
          (EtextBodyMigration.java:116-117)."""
        _, ric_all = self._admin_frames(streams)
        ric_err = ric_all.join(graphs, "graph", "left_anti").select(
            F.col("graph").alias("rid"),
            F.col("graph").alias("sub_rid"),
            F.lit("ET_GEN:workAdmin").alias("etype"),
            F.lit("missing IE graph for workAdmin ric propagation").alias("message"),
        )
        out = ric_err
        for prefix in ("M", ""):
            out = out.unionByName(
                self._repro_rows(streams, prefix)
                .join(graphs, "graph", "left_anti")
                .select(
                    F.col("graph").alias("rid"),
                    F.col("graph").alias("sub_rid"),
                    F.lit("ET_GEN:repro").alias("etype"),
                    F.concat(
                        F.lit("missing instance graph for back-link to "),
                        F.col("o_value"),
                    ).alias("message"),
                )
            )
        return out.unionByName(
            self._page_join(streams)
            .filter(F.col("seq").isNull())
            .select(
                F.col("graph").alias("rid"),
                F.col("graph").alias("sub_rid"),
                F.lit("ET_GEN:page").alias("etype"),
                F.concat(F.lit("cannot find image "), F.col("orig")).alias("message"),
            )
        )

    def _complete_symmetric(self, triples: DataFrame, symmetric: DataFrame,
                            graphs: DataFrame) -> DataFrame:
        """A1: queued inverse edges land in their destination graph iff
        that graph was migrated (the reference only patches existing files,
        MigrationApp.insertMissingSymetricTriples:547-568), then dedup."""
        bdr = "http://purl.bdrc.io/resource/"
        bdo = "http://purl.bdrc.io/ontology/core/"
        inverse = (
            symmetric.dropDuplicates(["dest_rid", "prop", "src_rid"])
            .join(graphs, symmetric.dest_rid == graphs.graph, "leftsemi")
            .select(
                F.col("dest_rid").alias("graph"),
                F.concat(F.lit(bdr), "dest_rid").alias("subject"),
                F.concat(F.lit(bdo), "prop").alias("predicate"),
                F.lit("iri").alias("o_kind"),
                F.concat(F.lit(bdr), "src_rid").alias("o_value"),
                F.lit(None).cast("string").alias("o_lang"),
                F.lit(None).cast("string").alias("o_datatype"),
            )
        )
        # no dedup here: the single full-row dropDuplicates runs once at
        # the end of the fused chain (_canonicalize) — one shuffle of the
        # big table instead of two
        return triples.unionByName(inverse)

    def _canonicalize(self, triples: DataFrame) -> DataFrame:
        """G1/G2: connected components over the duplicate-cluster pair
        lists -> representative rewrite of subject and object columns.

        The pair lists are authority data (~130k rows -> broadcastable);
        at 100 TB the same plan holds because the rewrite side stays small
        while the triple side never shuffles (two broadcast joins).

        The components themselves come from `_authority_rep_pairs()` — a
        process-cached pure-Python union-find: the clusters are STATIC
        shipped CSVs, so spinning three Spark jobs per pipeline run
        (createDataFrame -> count -> collect, ~1.5 s of serial driver
        time) to recompute a fixed 38k-entry mapping was pure overhead.
        The distributed operator (operators/connected_components.py)
        remains the path for data-derived edge sets (G1 query)."""
        dedup_cols = [
            "graph", "subject", "predicate", "o_kind", "o_value", "o_lang", "o_datatype"
        ]
        rep_pairs = _authority_rep_pairs()
        if not rep_pairs:
            return triples.dropDuplicates(dedup_cols)
        import pandas as pd

        bdr = "http://purl.bdrc.io/resource/"
        # pandas -> Arrow path: one zero-copy batch instead of per-row
        # Py4J conversion of tens of thousands of tuples
        rep = self.spark.createDataFrame(
            pd.DataFrame(
                [(bdr + n, bdr + c) for n, c in rep_pairs],
                columns=["_n", "_c"],
            )
        )
        # the broadcast hint here is safe (unlike the data-derived sides
        # elsewhere): rep is bounded by the shipped authority cluster
        # CSVs (~38k pairs), not by corpus size
        t = (
            triples.join(F.broadcast(rep), triples.subject == F.col("_n"), "left")
            .withColumn("subject", F.coalesce("_c", "subject"))
            .drop("_n", "_c")
        )
        t = (
            t.join(
                F.broadcast(rep),
                (t.o_kind == "iri") & (t.o_value == F.col("_n")),
                "left",
            )
            .withColumn("o_value", F.coalesce("_c", "o_value"))
            .drop("_n", "_c")
        )
        return t.dropDuplicates(
            ["graph", "subject", "predicate", "o_kind", "o_value", "o_lang", "o_datatype"]
        )

    def _finalize(self, triples: DataFrame, parsed_triples: DataFrame) -> DataFrame:
        """Partitioning columns: rdf-type group of the graph's root + a
        hash bucket over subject (the reference's md5 sharding,
        MigrationApp.getDstFileName:133-147).

        Root types come from `parsed_triples` (the materialized parse
        output), not from the fully-chained `triples`: the graph->type
        mapping is fixed at parse time (the reference routes each record
        by its migrated type regardless of later cluster rewrites), and
        reading it from the parquet-backed parse stage means the roots
        subquery is one column-pruned scan instead of a second execution
        of the whole link/complete/canonicalize chain."""
        rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        bdr = "http://purl.bdrc.io/resource/"
        roots = (
            parsed_triples.filter(
                (F.col("predicate") == rdf_type)
                & (F.col("subject") == F.concat(F.lit(bdr), F.col("graph")))
            )
            .groupBy("graph")
            .agg(F.min("o_value").alias("_root_type"))
            .select(
                "graph",
                F.regexp_extract("_root_type", r"([^/#]+)$", 1).alias("type_part"),
            )
        )
        # no broadcast hint: roots has one row per graph (data-derived,
        # unbounded at corpus scale) — AQE broadcasts when actually small
        return (
            triples.join(roots, "graph", "left")
            .withColumn("type_part", F.coalesce("type_part", F.lit("Admin")))
            .withColumn(
                "subject_bucket",
                F.pmod(F.xxhash64("subject"), F.lit(N_SUBJECT_BUCKETS)).cast("int"),
            )
        )

    def _imagegroup_conflicts(self, streams: dict) -> DataFrame:
        """A4: an image group claimed by more than one work is an error
        (MigrationApp.java:106,417-426 imageGroupWork map)."""
        claims = streams["links"].filter(
            F.col("prop").startswith("volume:") | (F.col("prop") == "isVolumeOf")
        )
        ig = F.when(
            F.col("prop") == "isVolumeOf", F.col("src_rid")
        ).otherwise(F.col("dst_rid"))
        work = F.when(
            F.col("prop") == "isVolumeOf", F.col("dst_rid")
        ).otherwise(F.col("src_rid"))
        return (
            claims.select(ig.alias("imagegroup"), work.alias("work"))
            .distinct()
            .groupBy("imagegroup")
            .agg(F.collect_set("work").alias("works"), F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .select("imagegroup", F.sort_array("works").alias("works"))
        )

    def _dangling(self, streams: dict) -> DataFrame:
        """J3: links to targets that are absent or not released."""
        links = streams["links"]
        released = streams["statuses"].filter(F.col("status") == "released").select(
            F.col("rid").alias("dst_rid")
        )
        return links.join(released, "dst_rid", "left_anti")


def run_pipeline(spark: SparkSession, src: DataFrame, out_dir: str, resume: bool = True,
                 extra_parsed: DataFrame | None = None) -> DataFrame:
    return Pipeline(spark, out_dir).run(src, resume=resume, extra_parsed=extra_parsed)
