"""ManifestTable — a keyed analytic table on the manifest-commit protocol,
with per-file zone maps (min/max data skipping) and copy-on-write MERGE.

The ``ManifestEventLog`` (streaming/manifest_log.py) proved the snapshot
model for *message logs*, where the only pruning key is the (ms, seq)
cursor. This generalizes it to *analytic tables*: every committed data
file carries min/max statistics for declared columns in the manifest, so

- a selective scan prunes FILES at plan time from driver-side metadata
  (``prune`` reads the manifest JSON, never a parquet footer) before
  Spark's own row-group pushdown sees the survivors — at 100 TB this is
  the difference between listing 100k files and opening 500; and
- ``merge`` (Delta/Iceberg-style copy-on-write upsert) rewrites ONLY the
  files whose key zone overlaps the update key set — the rest of the
  table is carried forward by reference in the new manifest.

Both inherit the object-store-safe pointer commit (streaming/commit.py):
data files are immutable and invisible until the manifest referencing
them commits, snapshots stay readable until ``vacuum``.

Reference parity: the reference has no table storage at all (its only
I/O is the Redis wire protocol, consumer.ex:142-157); this is §2.2
engine surface — the at-rest half of the stream/table duality, the same
role XADD-then-XRANGE plays for the log.

Scale notes: the manifest is one JSON document here; at 100 TB it shards
into partition-level manifest files under a manifest list (Iceberg's
two-level layout) — ``prune`` then reads only the manifest-list level
plus surviving shards. Nothing else changes: pruning math, COW merge,
and the pointer commit are layout-independent. The per-file stats agg at
write time is one metadata-light Spark job (groupBy input_file_name),
map-side combined, never a driver collect of data rows.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..streaming.commit import GenerationState


class CommitConflict(RuntimeError):
    """Another writer committed between this writer's snapshot read and
    its commit attempt — the optimistic-concurrency failure every
    lock-less table format surfaces (Delta's ConcurrentModification,
    Iceberg's CommitFailedException). The loser re-reads the new current
    generation and retries its operation; data files it staged are
    unreferenced garbage swept by vacuum()."""


def _stat_json(v):
    """JSON-safe, ORDER-PRESERVING zone-map encoding: ISO strings for
    date/datetime (lexicographic == chronological at fixed width),
    pass-through for int/float/str/None; anything else is rejected at
    write time rather than crashing json.dump after data files moved."""
    if v is None or isinstance(v, (int, float, str)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    raise TypeError(
        f"unsupported zone-map stats type {type(v).__name__}; supported: "
        "int, float, str, date, datetime"
    )


#: Per-file bloom filter sizing: BLOOM_BITS bits (as BLOOM_BITS//64
#: signed longs in the manifest), BLOOM_K hash probes per value. All
#: probes derive from ONE md5 of the value's string form — 4 disjoint
#: 32-bit hex slices — so the Spark aggregate and the driver-side probe
#: share the hash by construction (the repo's md5-derived-hash rule).
#: At 10k distinct values/file, 1024 bits / 4 probes gives ~1 false
#: positive per ~3 probed files at worst — false positives only cost an
#: extra file read; false negatives are impossible.
BLOOM_BITS = 1024
BLOOM_K = 4
BLOOM_WORDS = BLOOM_BITS // 64
_U64 = (1 << 64) - 1


def _bloom_word_expr(col: str, word: int) -> str:
    """SQL aggregate producing word ``word`` of a file's bloom filter
    for ``col``: each row contributes BLOOM_K bit positions (md5 hex
    slices mod BLOOM_BITS); positions landing in this 64-bit word OR a
    shifted bit in, BIT_OR folds the file. NULL values contribute no
    bits (IF's NULL condition takes the else branch)."""
    parts = []
    for i in range(BLOOM_K):
        p = (
            f"(CAST(CONV(SUBSTR(MD5(CAST(`{col}` AS STRING)), "
            f"{1 + 8 * i}, 8), 16, 10) AS BIGINT) % {BLOOM_BITS})"
        )
        parts.append(
            f"IF({p} DIV 64 = {word}, "
            f"SHIFTLEFT(CAST(1 AS BIGINT), CAST({p} % 64 AS INT)), "
            f"CAST(0 AS BIGINT))"
        )
    return f"BIT_OR({' | '.join(parts)})"


def _bloom_probe_bits(value) -> list[tuple[int, int]]:
    """Driver-side twin of :func:`_bloom_word_expr`: the (word, bit)
    pairs a value sets — identical md5-slice derivation, so a committed
    bloom can never false-negative a value the aggregate saw."""
    import hashlib

    h = hashlib.md5(str(value).encode()).hexdigest()
    out = []
    for i in range(BLOOM_K):
        p = int(h[8 * i : 8 * i + 8], 16) % BLOOM_BITS
        out.append((p // 64, 1 << (p % 64)))
    return out


#: _commit sentinel: "no OCC check" (full-overwrite semantics). Distinct
#: from base_gen=None, which means "I snapshotted an EMPTY table and my
#: commit must be its first" — the empty-table race is still a race.
_UNCHECKED = object()


def _evolve_schema(base: StructType, upd: StructType) -> StructType:
    """mergeSchema-style union: base columns keep their position and
    type; update-only columns append as NULLABLE (old files lack them —
    parquet by-name resolution NULL-fills at read). A type change is
    refused: implicit casts would silently corrupt zone-map ordering
    and downstream oracle hashes."""
    base_types = {f.name: f.dataType for f in base.fields}
    for f in upd.fields:
        if f.name in base_types and base_types[f.name] != f.dataType:
            raise ValueError(
                f"column {f.name!r} type change "
                f"{base_types[f.name].simpleString()} -> "
                f"{f.dataType.simpleString()} is not supported; cast the "
                "update frame to the table type explicitly"
            )
    from pyspark.sql.types import StructField

    extra = [
        StructField(f.name, f.dataType, True)
        for f in upd.fields
        if f.name not in base_types
    ]
    return StructType(list(base.fields) + extra)


class ManifestTable:
    """Keyed table: range-clustered immutable parquet files + a manifest
    of per-file zone maps, committed via generation pointer."""

    HISTORY_CAP = 16

    def __init__(
        self,
        root: str,
        key: str,
        stats_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ):
        self.root = root
        self.key = key
        self.stats_cols = [key] + [
            c for c in (stats_cols or []) if c != key
        ]
        #: Columns carrying a per-file bloom filter in the manifest —
        #: point-lookup skipping for columns the range clustering does
        #: NOT order (the key's zone maps already handle the key; a
        #: non-cluster column's zones span the whole domain in every
        #: file, so only a membership sketch can skip). Int/string
        #: columns only (the probe hashes the CAST-AS-STRING form).
        self.bloom_cols = list(bloom_cols or [])
        self.state = GenerationState(root)
        self.data_dir = os.path.join(root, "data")
        #: Merge-on-read delete sidecars (``delete_mor``) live here, one
        #: directory of key-parquet per delete commit; created lazily by
        #: the first sidecar write.
        self.deletes_dir = os.path.join(root, "deletes")
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest plumbing -------------------------------------------------

    def generations(self) -> list[int]:
        """Committed generations readable as snapshots, oldest first
        (HISTORY_CAP-retained)."""
        return [int(g) for g in self.state.meta().get("history", [])]

    def manifest(self, gen: int | None = None) -> list[dict]:
        if gen is None:
            cur = self.state.current_dir()
            if cur is None:
                return []
        else:
            # An expired or never-committed generation must RAISE — the
            # silent alternative reads an empty/torn manifest as "empty
            # table", the worst possible failure mode for a time-travel
            # API (same contract as ManifestEventLog.manifest).
            if gen not in self.generations():
                raise ValueError(
                    f"generation {gen} is not in the committed history "
                    f"{self.generations()} (expired or never committed)"
                )
            cur = self.state.gen_dir(gen)
        path = os.path.join(cur, "manifest.json")
        if not os.path.exists(path):
            return []
        with open(path) as fh:
            return json.load(fh)

    def schema(self, gen: int | None = None) -> StructType | None:
        """Schema of a committed generation (current by default) — the
        schema is snapshot state like the file list, persisted per
        generation: time travel across a schema change must read the
        OLD generation's files with the OLD schema (the current schema
        would surface silent NULLs for renamed/added columns)."""
        if gen is None:
            cur = self.state.current_dir()
            if cur is None:
                return None
        else:
            if gen not in self.generations():
                raise ValueError(
                    f"generation {gen} is not in the committed history "
                    f"{self.generations()} (expired or never committed)"
                )
            cur = self.state.gen_dir(gen)
        with open(os.path.join(cur, "schema.json")) as fh:
            return StructType.fromJson(json.load(fh))

    def _commit(
        self,
        entries: list[dict],
        schema: StructType,
        base_gen=_UNCHECKED,
    ) -> None:
        """Publish a new generation. ``base_gen`` is the generation the
        writer's read snapshot came from (optimistic concurrency): if the
        pointer has moved past it by commit time, another writer won the
        race and THIS commit would silently drop their changes — raise
        CommitConflict instead so the caller re-reads and retries. The
        single-object pointer makes the window between check and swap a
        same-process memory race only; on a real object store the check
        rides the conditional-PUT (If-Match) every store now offers.
        ``base_gen=None`` means the writer snapshotted an EMPTY table and
        this commit must be its first (the empty-table race is still a
        lost-update race); only ``write()`` — full-overwrite semantics —
        commits without the check (_UNCHECKED)."""
        if base_gen is not _UNCHECKED:
            cur = self.state.current_gen()
            if cur != base_gen:
                raise CommitConflict(
                    f"table advanced to gen={cur} since this writer read "
                    f"gen={base_gen}; re-read and retry"
                )
        gen, path = self.state.stage()
        with open(os.path.join(path, "manifest.json"), "w") as fh:
            json.dump(entries, fh)
        with open(os.path.join(path, "schema.json"), "w") as fh:
            json.dump(schema.jsonValue(), fh)
        history = (
            [int(g) for g in self.state.meta().get("history", [])] + [gen]
        )[-self.HISTORY_CAP:]
        self.state.commit(
            gen,
            rows=sum(e["rows"] for e in entries),
            files=len(entries),
            history=history,
        )
        self.state.cleanup(keep=set(history))

    def _write_files(self, df: DataFrame) -> list[dict]:
        """Write ``df`` as immutable data files and return manifest
        entries with per-file min/max zone maps for ``stats_cols``.
        One metadata-light agg computes every file's stats in a single
        map-side-combined job; files are invisible until the manifest
        commits (plain PUTs are object-store safe)."""
        stage = os.path.join(self.root, f"_stage-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(stage)
        spark = df.sparkSession
        aggs = [F.count(F.lit(1)).alias("rows")]
        for c in self.stats_cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        for c in self.bloom_cols:
            for w in range(BLOOM_WORDS):
                aggs.append(
                    F.expr(_bloom_word_expr(c, w)).alias(f"bloom_{c}_{w}")
                )
        stats = (
            spark.read.schema(df.schema)
            .parquet(stage)
            .groupBy(F.input_file_name().alias("f"))
            .agg(*aggs)
            .collect()
        )
        entries = []
        for r in stats:
            name = f"{uuid.uuid4().hex}.parquet"
            src = r["f"]
            src = src[len("file:"):] if src.startswith("file:") else src
            os.rename(src, os.path.join(self.data_dir, name))
            entry = {
                "file": os.path.join("data", name),
                "rows": r["rows"],
                "stats": {
                    c: [
                        _stat_json(r[f"min_{c}"]),
                        _stat_json(r[f"max_{c}"]),
                    ]
                    for c in self.stats_cols
                },
            }
            if self.bloom_cols:
                entry["bloom"] = {
                    c: [
                        int(r[f"bloom_{c}_{w}"] or 0)
                        for w in range(BLOOM_WORDS)
                    ]
                    for c in self.bloom_cols
                }
            entries.append(entry)
        shutil.rmtree(stage, ignore_errors=True)
        return entries

    # -- write -------------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        target_files: int = 8,
        cluster_by: "F.Column | None" = None,
    ) -> None:
        """(Re)load the table: RANGE-cluster on the key so files carry
        DISJOINT key zones — the layout that makes zone-map pruning and
        COW merge touch O(selectivity) files instead of all of them
        (hash placement would smear every key range over every file).

        ``cluster_by`` overrides the placement key with an arbitrary
        expression — pass a Morton/Hilbert key (plans/zorder.py) to get
        MULTI-dimension zone locality: every stats column interleaved
        into the curve gets tight per-file ranges, so box predicates
        prune files on all of them at once (Delta's OPTIMIZE ZORDER BY,
        surfaced at the manifest level)."""
        if cluster_by is None:
            clustered = df.repartitionByRange(target_files, self.key)
        else:
            clustered = (
                df.withColumn("_ck", cluster_by)
                .repartitionByRange(target_files, "_ck")
                .sortWithinPartitions("_ck")
                .drop("_ck")
            )
        entries = self._write_files(clustered)
        self._commit(entries, df.schema)

    # -- read / scan -------------------------------------------------------

    def read(self, spark: SparkSession, gen: int | None = None) -> DataFrame:
        """Snapshot read: the pointer is resolved ONCE — file list and
        schema both come from the same pinned generation, so a racing
        writer's commit between the two lookups can't mix states (the
        reader contract commit.py documents)."""
        if gen is None:
            gen = self.state.current_gen()
            if gen is None:
                return spark.createDataFrame([], StructType())
        return self._read_entries(spark, self.manifest(gen), self.schema(gen))

    def _read_entries(
        self, spark: SparkSession, entries: list[dict], schema
    ) -> DataFrame:
        """Materialize the LOGICAL rows of ``entries``: the physical
        data files minus their merge-on-read delete sidecars, each
        sidecar SCOPED to the files whose entries reference it (nothing
        loads for entries without deletes; a pruned scan therefore also
        prunes delete keys to the surviving files' sidecars).

        Scoping is load-bearing, not an optimization: a ``delete_mor``
        batch spanning several files attaches ONE shared sidecar to all
        of them, and a later COW re-upsert of a deleted key rewrites
        only that key's file — the new file carries no reference, but
        sibling files still do. A global union anti-join would let the
        siblings' reference hide the re-upserted row (measured: 2-file
        table, cross-file delete, merge re-upsert → row silently lost).
        So both scans project provenance via ``input_file_name()``
        (data files and sidecar dirs are uuid-named — basenames are
        identities), the manifest's (data file, sidecar) reference
        pairs broadcast (metadata-sized), and the anti-join matches on
        (key, data file): a delete key suppresses rows ONLY in files
        whose own entry lists its sidecar. Sidecars stay trickle-sized,
        so the scoped build side broadcasts while small and AQE falls
        back to shuffle as it grows — ``compact`` folds them either way."""
        if not entries:
            return spark.createDataFrame([], schema or StructType())
        df = spark.read.schema(schema).parquet(
            *[os.path.join(self.root, e["file"]) for e in entries]
        )
        refs = sorted({r for e in entries for r in e.get("deletes", ())})
        if refs:
            # The anti-join plumbing uses engine-internal temp columns;
            # refuse a user schema that shadows them rather than
            # silently overwriting a data column (ADVICE r9).
            clash = {"_dfile", "_dk", "_dfk", "_sdir"} & set(df.columns)
            if clash:
                raise ValueError(
                    f"table schema uses reserved internal column(s) "
                    f"{sorted(clash)}; rename them — the MOR read path "
                    f"needs these names for delete-sidecar scoping"
                )
            pairs = spark.createDataFrame(
                [
                    (os.path.basename(e["file"]), os.path.basename(r))
                    for e in entries
                    for r in e.get("deletes", ())
                ],
                ["_dfile", "_sdir"],
            )
            dels = (
                spark.read.parquet(
                    *[os.path.join(self.root, r) for r in refs]
                )
                .select(
                    F.col(self.key).alias("_dk"),
                    F.element_at(
                        F.split(F.input_file_name(), "/"), -2
                    ).alias("_sdir"),
                )
                .join(F.broadcast(pairs), "_sdir")
                .select("_dk", F.col("_dfile").alias("_dfk"))
            )
            tagged = df.withColumn(
                "_dfile",
                F.element_at(F.split(F.input_file_name(), "/"), -1),
            )
            df = tagged.join(
                dels,
                (tagged[self.key] == dels["_dk"])
                & (tagged["_dfile"] == dels["_dfk"]),
                "left_anti",
            ).drop("_dfile")
        return df

    def prune(self, col: str, lo, hi) -> tuple[list[dict], int]:
        """Driver-side zone-map pruning: entries whose [min,max] for
        ``col`` intersects [lo, hi], plus the total file count. Pure
        manifest metadata — no parquet footer is opened."""
        return self.prune_box({col: (lo, hi)})

    def prune_box(self, preds: dict, gen: int | None = None) -> tuple[list[dict], int]:
        """Multi-column zone pruning: a file survives only if its zone
        intersects EVERY [lo, hi] in ``preds`` — with a space-filling-
        curve layout (``write(cluster_by=zvalue(...))``) each clustered
        dimension's zones are tight, so a box prunes on all of them."""
        kept = self.manifest(gen)
        total = len(kept)
        for col, (lo, hi) in preds.items():
            if col not in self.stats_cols:
                raise KeyError(
                    f"no zone map for {col!r}; have {self.stats_cols}"
                )
            lo, hi = _stat_json(lo), _stat_json(hi)
            kept = [
                e
                for e in kept
                if e["stats"][col][0] is not None
                and not (e["stats"][col][1] < lo or e["stats"][col][0] > hi)
            ]
        return kept, total

    def prune_values(
        self, col: str, values: list, gen: int | None = None
    ) -> tuple[list[dict], int]:
        """Driver-side bloom pruning for a point-lookup value set: a
        file survives if ANY probe value has all its BLOOM_K bits set in
        the file's filter for ``col``. Files committed without a bloom
        for the column are kept (a sketch may only SKIP, never decide
        membership) — false positives cost one extra file read, false
        negatives are structurally impossible (the probe and the write
        aggregate derive bits from the same md5 slices)."""
        entries = self.manifest(gen)
        total = len(entries)
        probes = [_bloom_probe_bits(v) for v in values]
        kept = []
        for e in entries:
            words = (e.get("bloom") or {}).get(col)
            if words is None:
                kept.append(e)
                continue
            uw = [w & _U64 for w in words]
            if any(
                all(uw[wi] & bit == bit for wi, bit in probe)
                for probe in probes
            ):
                kept.append(e)
        return kept, total

    def lookup(self, spark: SparkSession, col: str, values: list) -> DataFrame:
        """Point lookup on a (typically non-cluster) column: bloom
        filters drop files at plan time, the residual IN-filter applies
        on the survivors and pushes to parquet row groups — the
        secondary-index story for a table whose placement is owned by a
        different key."""
        gen = self.state.current_gen()
        if gen is None:
            return spark.createDataFrame([], StructType())
        kept, _total = self.prune_values(col, values, gen=gen)
        df = self._read_entries(spark, kept, self.schema(gen))
        return df.filter(F.col(col).isin(values))

    def scan(self, spark: SparkSession, col: str, lo, hi) -> DataFrame:
        """Range scan with file skipping: zone maps drop non-overlapping
        files at plan time; the residual predicate still applies (zone
        maps are file-granular) and Spark pushes it to the surviving
        parquet row groups — two pruning levels, metadata-only first."""
        return self.scan_box(spark, {col: (lo, hi)})

    def scan_box(self, spark: SparkSession, preds: dict) -> DataFrame:
        """Box scan over any subset of the stats columns — file skipping
        on every predicate, then the residual conjunction pushed to the
        surviving parquet row groups."""
        gen = self.state.current_gen()
        if gen is None:
            return spark.createDataFrame([], StructType())
        kept, _total = self.prune_box(preds, gen=gen)
        df = self._read_entries(spark, kept, self.schema(gen))
        cond = None
        for col, (lo, hi) in preds.items():
            c = (F.col(col) >= lo) & (F.col(col) <= hi)
            cond = c if cond is None else (cond & c)
        return df.filter(cond)

    # -- merge (copy-on-write upsert) --------------------------------------

    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        delete_keys: DataFrame | None = None,
    ) -> dict:
        """Upsert ``updates`` by key (matched rows replaced, unmatched
        inserted) — Delta-style copy-on-write. ``delete_keys`` (a
        1-column frame of table keys) rides the SAME COW pass: its keys
        widen the affected-file set and are anti-joined out of the
        rewrite without being re-added — per-key CDC DELETE at the cost
        of the one rewrite the upserts already pay (``merge_cdc`` is
        the op-column front end). Deleting an absent key is a no-op by
        construction (the anti-join finds nothing to drop).

        1. files whose key zone overlaps the update key set are found by
           range-joining the distinct update keys against the BROADCAST
           manifest ranges (the manifest is metadata-sized; update keys
           never leave the executors);
        2. ONLY those files are rewritten, minus matched keys (left_anti
           on the bounded update-key relation), unioned with the update
           rows, re-range-clustered;
        3. untouched files carry forward by reference; one pointer commit
           publishes the new manifest.

        Replay-idempotent: merging the same update batch twice yields the
        same table (upsert by key), so a foreachBatch retry is safe.
        Inserted keys outside rewritten zones make zone ranges overlap;
        pruning stays correct (overlap only loosens it) and the next
        ``compact_zones``/``write`` restores disjointness.

        SCHEMA EVOLUTION (Delta's mergeSchema, at the manifest level):
        update-only columns APPEND to the table schema as nullable; the
        evolved schema commits with the new generation, and untouched
        files still carry forward BY REFERENCE — parquet's by-name
        column resolution fills the missing new columns with NULL at
        read time, so evolution rewrites zero extra bytes. Rows in
        ``updates`` missing an existing column get NULL there (merge is
        whole-row replace, not per-column patch). A column whose TYPE
        differs from the table's is refused (``ValueError``) — silent
        casts corrupt zone maps and oracle hashes. Time travel stays
        honest: each generation pins its own schema, so a pre-evolution
        snapshot reads with the pre-evolution schema.
        """
        base_gen = self.state.current_gen()
        entries = self.manifest(base_gen) if base_gen is not None else []
        if not entries:
            # First-commit path still races (two writers can both see the
            # empty table): commit with base_gen=None so the loser gets
            # CommitConflict instead of silently erasing the winner.
            # delete_keys against an empty table delete nothing.
            clustered = updates.repartitionByRange(8, self.key)
            new_entries = self._write_files(clustered)
            self._commit(new_entries, updates.schema, base_gen=base_gen)
            return {"files_total": 0, "files_rewritten": 0}
        ranges = [
            (e["file"], e["stats"][self.key][0], e["stats"][self.key][1])
            for e in entries
        ]
        rdf = F.broadcast(
            updates.sparkSession.createDataFrame(
                ranges, ["file", "lo", "hi"]
            )
        )
        keys = updates.select(F.col(self.key).alias("_k"))
        if delete_keys is not None:
            keys = keys.unionByName(
                delete_keys.select(F.col(delete_keys.columns[0]).alias("_k"))
            )
        keys = keys.distinct()
        hit = {
            r["file"]
            for r in keys.join(
                rdf,
                (F.col("_k") >= F.col("lo")) & (F.col("_k") <= F.col("hi")),
            )
            .select("file")
            .distinct()
            .collect()
        }
        affected = [e for e in entries if e["file"] in hit]
        untouched = [e for e in entries if e["file"] not in hit]
        if not affected and updates.isEmpty():
            # Pure no-op batch (e.g. a delete-only CDC batch whose keys
            # hit no file zones): nothing to rewrite, nothing to insert.
            # Returning without a commit keeps history clean — otherwise
            # an empty rewrite burns a generation and can push a rows=0
            # NULL-stats entry into the manifest.
            return {"files_total": len(entries), "files_rewritten": 0}
        schema = self.schema(base_gen)
        evolved = _evolve_schema(schema, updates.schema)

        def conform(df: DataFrame) -> DataFrame:
            have = set(df.columns)
            return df.select(
                *[
                    F.col(f.name)
                    if f.name in have
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in evolved.fields
                ]
            )

        parts = [conform(updates)]
        if affected:
            # logical rows: a merge-on-read-deleted key in an affected
            # file must NOT resurrect through the COW rewrite.
            old = self._read_entries(spark, affected, schema)
            parts.append(
                conform(
                    old.join(
                        keys.withColumnRenamed("_k", self.key),
                        self.key,
                        "left_anti",
                    )
                )
            )
        rewritten = parts[0]
        for p in parts[1:]:
            rewritten = rewritten.unionByName(p)
        n_files = max(len(affected), 1)
        new_entries = self._write_files(
            rewritten.repartitionByRange(n_files, self.key)
        )
        self._commit(untouched + new_entries, evolved, base_gen=base_gen)
        return {
            "files_total": len(entries),
            "files_rewritten": len(affected),
        }

    def merge_cdc(
        self,
        spark: SparkSession,
        changes: DataFrame,
        op_col: str = "op",
        mor_deletes: bool = False,
    ) -> dict:
        """Apply a CDC batch in ONE commit: rows whose ``op_col`` is
        'D' delete their key, every other row upserts (the usual
        I/U/D change-feed contract, Delta's MERGE WHEN MATCHED THEN
        DELETE). The caller must resolve multiple ops per key to one
        final row first (``StreamingUpsert._latest_per_key`` does) —
        one batch, one verdict per key, or the rewrite would be
        nondeterministic. Replay-idempotent like ``merge``: re-applying
        the same resolved batch converges to the same table.

        ``mor_deletes=True`` routes a DELETE-ONLY batch through the
        merge-on-read sidecar path (``delete_mor`` — zero data files
        rewritten) instead of the COW rewrite. Only the pure-delete
        case routes: a mixed batch is already paying the COW rewrite
        for its upserts, so its deletes ride that one commit for free —
        splitting it into two commits would break the one-batch
        one-commit contract for nothing."""
        ups = changes.filter(F.col(op_col) != "D").drop(op_col)
        dels = changes.filter(F.col(op_col) == "D").select(self.key)
        if mor_deletes and ups.isEmpty():
            return self.delete_mor(spark, dels)
        return self.merge(spark, ups, delete_keys=dels)

    def delete(self, spark: SparkSession, col: str, lo, hi) -> dict:
        """Range delete, same COW discipline: only zone-overlapping
        files are rewritten (minus the deleted range); the rest carry
        forward by reference."""
        base_gen = self.state.current_gen()
        if base_gen is None:
            return {"files_total": 0, "files_rewritten": 0}
        kept, total = self.prune_box({col: (lo, hi)}, gen=base_gen)
        if not kept:
            return {"files_total": total, "files_rewritten": 0}
        schema = self.schema(base_gen)
        hit = {e["file"] for e in kept}
        untouched = [
            e for e in self.manifest(base_gen) if e["file"] not in hit
        ]
        old = self._read_entries(spark, kept, schema)
        remain = old.filter(~((F.col(col) >= lo) & (F.col(col) <= hi)))
        new_entries = self._write_files(
            remain.repartitionByRange(max(len(kept), 1), self.key)
        )
        self._commit(untouched + new_entries, schema, base_gen=base_gen)
        return {"files_total": total, "files_rewritten": len(kept)}

    def mor_debt(self, gen: int | None = None) -> dict:
        """Merge-on-read maintenance readout (the ``cell_skew``
        pattern, VERDICT r8 item 4): per-file sidecar reference count
        and bytes for every file carrying delete sidecars, plus the
        table-wide maximum. Pure driver-side metadata — a shared
        sidecar is counted once PER REFERENCING FILE because that is
        what a reader pays (each scanned file contributes its own
        refs to the anti-join build side). Feed ``max_sidecars`` into
        ``delete_mor(fold_threshold=...)`` or schedule ``compact()``
        when it drifts."""
        entries = self.manifest(gen)
        per_file = []
        for e in entries:
            refs = list(e.get("deletes", ()))
            if not refs:
                continue
            nbytes = 0
            missing = 0
            for r in refs:
                d = os.path.join(self.root, r)
                if os.path.isdir(d):
                    nbytes += sum(
                        os.path.getsize(os.path.join(d, f))
                        for f in os.listdir(d)
                        if f.endswith(".parquet")
                    )
                else:
                    # A historical generation can reference sidecars
                    # vacuumed since — surface that instead of silently
                    # counting 0 bytes and understating debt (ADVICE r9).
                    missing += 1
            per_file.append(
                {
                    "file": e["file"],
                    "sidecars": len(refs),
                    "sidecar_bytes": nbytes,
                    "missing_sidecars": missing,
                }
            )
        return {
            "files_with_debt": len(per_file),
            "max_sidecars": max(
                (p["sidecars"] for p in per_file), default=0
            ),
            "total_refs": sum(p["sidecars"] for p in per_file),
            "missing_sidecars": sum(p["missing_sidecars"] for p in per_file),
            "per_file": per_file,
        }

    def delete_mor(
        self,
        spark: SparkSession,
        keys: DataFrame,
        fold_threshold: int | None = None,
    ) -> dict:
        """Merge-on-read delete (Delta deletion vectors / Iceberg
        equality deletes, keyed): drop ``keys`` (a 1-column frame of
        table keys) by COMMITTING A SIDECAR, rewriting ZERO data files —
        the trickle-delete path (GDPR erasure against a 100 TB table)
        where copy-on-write's rewrite-every-overlapping-file cost is
        unpayable per request.

        Mechanics: the distinct keys range-join the BROADCAST manifest
        zone ranges (metadata-sized — keys never leave the executors);
        only zone-plausible keys are written, once, as one parquet
        sidecar under ``deletes/``; every zone-overlapping file's
        manifest entry gains a reference to it. Readers anti-join the
        sidecars of exactly the files they scan (``_read_entries``), so
        pruning prunes delete keys too. A key can only be PRESENT in a
        file whose zone covers it, so attaching the shared sidecar to
        all hit files over-approximates safely (the anti-join ignores
        keys a file never held). Absent keys are a metadata-only no-op.

        Lifecycle: ``merge``/``delete`` rewrites apply sidecars before
        rewriting (no resurrection), a re-upsert of a deleted key lands
        in a NEW file no sidecar covers (visible again), ``compact``
        folds all sidecars into a clean COW rewrite, and ``vacuum``
        reclaims unreferenced sidecars. Per-entry ``rows`` stay PHYSICAL
        counts (the manifest's size accounting), which is why
        ``delete_mor`` reports ``files_affected`` instead of a row
        delta — computing one would force the data scan this path
        exists to avoid. Replay-idempotent in effect (re-deleting the
        same keys re-commits a redundant sidecar; reads are unchanged)
        and OCC-checked like every other writer.

        MAINTENANCE POLICY (``fold_threshold``, VERDICT r8 item 4): a
        trickle-delete workload stacks one sidecar reference per commit
        on every overlapping file, and every reader pays an anti-join
        row per accumulated reference until someone compacts — the
        unbounded-debt failure Delta/Iceberg prevent by pairing DVs
        with an automatic rewrite threshold. Passing ``fold_threshold=K``
        bounds the debt: any file whose reference count would EXCEED K
        after this commit is instead rewritten (its sidecars applied,
        references dropped) inside the SAME commit — the amortized
        CO-W rewrite fires once per K deletes per file instead of per
        delete, and read cost stays O(K) per file. Opt-in because the
        rewrite changes this call's cost class from metadata-only to
        O(folded files); ``mor_debt()`` is the readout for choosing K.
        Folded files' sidecars become unreferenced and ``vacuum()``
        reclaims them."""
        base_gen = self.state.current_gen()
        if base_gen is None:
            return {
                "files_total": 0,
                "files_rewritten": 0,
                "files_affected": 0,
            }
        entries = self.manifest(base_gen)
        ranges = [
            (e["file"], e["stats"][self.key][0], e["stats"][self.key][1])
            for e in entries
        ]
        rdf = F.broadcast(
            spark.createDataFrame(ranges, ["file", "lo", "hi"])
        )
        kdf = keys.select(F.col(keys.columns[0]).alias("_k")).distinct()
        matched = kdf.join(
            rdf, (F.col("_k") >= F.col("lo")) & (F.col("_k") <= F.col("hi"))
        )
        hit = {
            r["file"] for r in matched.select("file").distinct().collect()
        }
        if not hit:
            # every key is outside every zone: nothing to delete, and a
            # commit would burn a history slot (the merge() no-op rule).
            return {
                "files_total": len(entries),
                "files_rewritten": 0,
                "files_affected": 0,
            }
        ref = os.path.join("deletes", uuid.uuid4().hex)
        matched.select(F.col("_k").alias(self.key)).distinct().coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(self.root, ref))
        new_entries = [
            {**e, "deletes": list(e.get("deletes", ())) + [ref]}
            if e["file"] in hit
            else e
            for e in entries
        ]
        folded = 0
        if fold_threshold is not None:
            over = [
                e
                for e in new_entries
                if len(e.get("deletes", ())) > fold_threshold
            ]
            if over:
                # fold ONLY the over-threshold files: read them with
                # their sidecars applied (the just-written ref is
                # already attached, so this delete's keys fold too)
                # and rewrite them clean — same commit, amortized
                # once-per-K-deletes instead of reader-pays-forever.
                keep = [
                    e
                    for e in new_entries
                    if len(e.get("deletes", ())) <= fold_threshold
                ]
                schema = self.schema(base_gen)
                clean = self._write_files(
                    self._read_entries(spark, over, schema)
                    .repartitionByRange(max(len(over), 1), self.key)
                )
                new_entries = keep + clean
                folded = len(over)
        self._commit(new_entries, self.schema(base_gen), base_gen=base_gen)
        return {
            "files_total": len(entries),
            "files_rewritten": folded,
            "files_affected": len(hit),
        }

    def delete_mor_where(
        self, spark: SparkSession, col: str, lo, hi
    ) -> dict:
        """Predicate merge-on-read delete: drop every row whose ``col``
        falls in [lo, hi] — the "erase this user's rows" shape where the
        predicate column is NOT the table key. One zone/bloom-agnostic
        pass derives the matching KEYS from the pruned file subset
        (``prune_box`` when ``col`` carries zone maps, every file
        otherwise), then the key batch rides the ``delete_mor`` sidecar
        path — still ZERO data files rewritten; the scan this performs
        is a read, which the table was going to pay to find the rows
        under any design (Delta's DV flow scans to build the vector
        too)."""
        base_gen = self.state.current_gen()
        if base_gen is None:
            return {
                "files_total": 0,
                "files_rewritten": 0,
                "files_affected": 0,
            }
        if col in self.stats_cols:
            kept, _ = self.prune_box({col: (lo, hi)}, gen=base_gen)
        else:
            kept = self.manifest(base_gen)
        matching = self._read_entries(
            spark, kept, self.schema(base_gen)
        ).filter((F.col(col) >= lo) & (F.col(col) <= hi))
        return self.delete_mor(spark, matching.select(self.key))

    def stats_agg(self, gen: int | None = None) -> dict:
        """Metadata-only COUNT/MIN/MAX over every stats column: answered
        from the manifest's per-file row counts and zone maps without
        opening a single data file — Delta/Iceberg's stats-based query
        answering, the reason the writer pays for per-file stats at all
        (tests pin the property by DELETING the data files first: the
        answer must survive). REFUSES (ValueError) when any entry
        carries merge-on-read delete sidecars — physical counts then
        overstate logical rows, and a silently stale answer is the worst
        failure mode for a metadata shortcut; ``compact()`` folds the
        sidecars and re-enables it. MIN/MAX are copied values, never
        arithmetic, so they are exact for every type the zone maps
        carry."""
        entries = self.manifest(gen)
        if any(e.get("deletes") for e in entries):
            raise ValueError(
                "stats_agg would be stale under merge-on-read deletes "
                "(physical row counts exclude no sidecar keys); run "
                "compact() first or read() the table"
            )
        out: dict = {"rows": sum(e["rows"] for e in entries)}
        for c in self.stats_cols:
            los = [
                e["stats"][c][0]
                for e in entries
                if e["stats"][c][0] is not None
            ]
            his = [
                e["stats"][c][1]
                for e in entries
                if e["stats"][c][1] is not None
            ]
            out[f"min_{c}"] = min(los) if los else None
            out[f"max_{c}"] = max(his) if his else None
        return out

    def table_changes(
        self, spark: SparkSession, gen_from: int, gen_to: int | None = None
    ) -> DataFrame:
        """Change data feed between two retained snapshots: one keyed
        full-outer diff emitting post-image rows tagged ``insert`` /
        ``update`` (pre-image for ``delete``) in a ``_change_type``
        column — Delta's CDF surface, derived from snapshots instead of
        logged, which is exactly what the generation history makes
        affordable: both sides are manifest file lists, the join is
        key-partitioned, unchanged rows drop out.

        Scale note: a snapshot diff reads both generations' files; the
        COW layout bounds that in practice (untouched files are SHARED
        between generations and could be skipped entirely by comparing
        manifest file ids before reading — an optimization the file-id
        equality below implements: only files that differ between the
        manifests are scanned)."""
        if gen_to is None:
            gen_to = self.state.current_gen()
        ents_a = self.manifest(gen_from)
        ents_b = self.manifest(gen_to)
        schema = self.schema(gen_to)
        schema_a = self.schema(gen_from)
        if schema_a != schema:
            raise ValueError(
                "table_changes across a schema change is not defined "
                f"(gen={gen_from} and gen={gen_to} have different schemas); "
                "diff within one schema epoch"
            )
        cols = schema.fieldNames()

        # shared-file skip identity = (file, delete sidecars): a file
        # carried forward BY REFERENCE holds identical logical rows only
        # if its merge-on-read delete set is also unchanged — a
        # delete_mor commit changes logical content with zero data-file
        # churn, and must surface here as delete rows.
        def ident(e: dict):
            return (e["file"], tuple(e.get("deletes", ())))

        ids_a = {ident(e) for e in ents_a}
        ids_b = {ident(e) for e in ents_b}
        a = self._read_entries(
            spark, [e for e in ents_a if ident(e) not in ids_b], schema
        )
        b = self._read_entries(
            spark, [e for e in ents_b if ident(e) not in ids_a], schema
        )
        aj = a.select(
            F.col(self.key).alias("_k"), F.struct(*cols).alias("_a")
        )
        bj = b.select(
            F.col(self.key).alias("_k"), F.struct(*cols).alias("_b")
        )
        j = aj.join(bj, "_k", "full_outer")
        tagged = j.select(
            F.when(F.col("_a").isNull(), F.lit("insert"))
            .when(F.col("_b").isNull(), F.lit("delete"))
            .when(~F.col("_a").eqNullSafe(F.col("_b")), F.lit("update"))
            .alias("_change_type"),
            F.coalesce(F.col("_b"), F.col("_a")).alias("_img"),
        ).filter(F.col("_change_type").isNotNull())
        return tagged.select(
            "_change_type", *[F.col(f"_img.{c}").alias(c) for c in cols]
        )

    def compact(self, spark: SparkSession, target_files: int = 8) -> int:
        """OPTIMIZE: rewrite the table re-range-clustered on the key,
        restoring disjoint zones and bin-packing merge fragmentation
        (out-of-range inserts loosen zone overlap over time — the
        writer-commits-fast / maintenance-restores-layout split every
        table format uses). Returns the file count before compaction.
        Old files become unreferenced; ``vacuum()`` reclaims them after
        in-flight readers drain."""
        base_gen = self.state.current_gen()
        if base_gen is None:
            return 0
        before = len(self.manifest(base_gen))
        df = self.read(spark, gen=base_gen)
        entries = self._write_files(
            df.repartitionByRange(target_files, self.key)
        )
        # OCC here too: a merge landing between this read and commit
        # would be silently erased by the rewrite otherwise.
        self._commit(entries, self.schema(base_gen), base_gen=base_gen)
        return before

    def restore(self, gen: int) -> dict:
        """Roll the table back to snapshot ``gen`` — as a NEW commit
        (Delta RESTORE semantics): the target generation's manifest and
        schema are re-published under a fresh generation number, so the
        rollback itself is in the history (auditable, itself restorable)
        and readers pinned to intermediate snapshots are untouched. Pure
        metadata — zero data files move. Raises for expired/unknown
        generations (``manifest``'s contract) and CommitConflict if a
        writer lands between the read and the commit."""
        base_gen = self.state.current_gen()
        entries = self.manifest(gen)
        schema = self.schema(gen)
        self._commit(entries, schema, base_gen=base_gen)
        return {"restored_gen": gen, "files": len(entries)}

    def vacuum(self) -> int:
        """Delete data files the current generation doesn't reference
        (expires older snapshots — the Delta VACUUM trade, explicit),
        and TRIM the expired generations out of the committed history so
        ``generations()``/``manifest(gen)`` stop advertising snapshots
        whose files are gone (they would otherwise fail mid-scan with
        PATH_NOT_FOUND instead of the contracted expired-gen error)."""
        cur = self.state.current_gen()
        cur_man = self.manifest()
        live = {os.path.basename(e["file"]) for e in cur_man}
        live_refs = {
            os.path.basename(r)
            for e in cur_man
            for r in e.get("deletes", ())
        }
        removed = 0
        for name in os.listdir(self.data_dir):
            if name not in live:
                os.remove(os.path.join(self.data_dir, name))
                removed += 1
        if os.path.isdir(self.deletes_dir):
            # delete sidecars are snapshot state like data files: reclaim
            # the ones the current generation no longer references
            # (compact folds them into the rewrite, orphaning them).
            for name in os.listdir(self.deletes_dir):
                if name not in live_refs:
                    shutil.rmtree(
                        os.path.join(self.deletes_dir, name),
                        ignore_errors=True,
                    )
                    removed += 1
        if cur is not None and removed:
            survivors = [
                g
                for g in self.generations()
                if g == cur
                or (
                    {
                        os.path.basename(e["file"])
                        for e in self.manifest(g)
                    }
                    <= live
                    and {
                        os.path.basename(r)
                        for e in self.manifest(g)
                        for r in e.get("deletes", ())
                    }
                    <= live_refs
                )
            ]
            meta = self.state.meta()
            self.state.commit(
                cur,
                rows=meta.get("rows", 0),
                files=meta.get("files", 0),
                history=survivors,
            )
            self.state.cleanup(keep=set(survivors))
        return removed


# ---------------------------------------------------------------------------
# Registry faces. Both faces REBUILD the table from the source parquet each
# call (the build is part of what's verified: if clustering, stats, pruning,
# or the COW rewrite lost/duplicated a row, the hash diverges); scratch dirs
# are per-prefix and swept (sources/ingest.py:82 discipline).
# ---------------------------------------------------------------------------

#: q145 scan range — chosen to cover a minority of the key domain at every
#: test SF so zone-map pruning is visible (pytest asserts files skipped).
Q145_LO, Q145_HI = 1200, 2400

Q145_SQL = f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_orderkey BETWEEN {Q145_LO} AND {Q145_HI}
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

#: q146 merge inputs: updates bump prices in one key range (exercises the
#: partial COW rewrite), inserts land past every real key (exercises the
#: unmatched branch). +1000.0 on a 2-decimal double is IEEE-exact in both
#: engines; the key offset keeps inserted keys disjoint at every SF.
Q146_UPD_LO, Q146_UPD_HI = 200, 699
Q146_INS_OFFSET = 10_000_000

Q146_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey BETWEEN {Q146_UPD_LO} AND {Q146_UPD_HI}
),
ins AS (
  SELECT o_orderkey + {Q146_INS_OFFSET} AS o_orderkey, o_custkey,
         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 13
),
merged AS (
  SELECT * FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    AND o_orderkey NOT IN (SELECT o_orderkey FROM ins)
  UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM ins
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

Q146B_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority,
         'adjusted' AS o_note
  FROM orders WHERE o_orderkey BETWEEN {Q146_UPD_LO} AND {Q146_UPD_HI}
),
ins AS (
  SELECT o_orderkey + {Q146_INS_OFFSET} AS o_orderkey, o_custkey,
         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
         'new' AS o_note
  FROM orders WHERE o_orderkey % 97 = 13
),
merged AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         CAST(NULL AS VARCHAR) AS o_note
  FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
  UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice, o_note FROM upd
  UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice, o_note FROM ins
)
SELECT COALESCE(o_note, 'carried') AS note,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM merged
GROUP BY COALESCE(o_note, 'carried')
ORDER BY note
"""

#: q178 range delete: the oracle is the anti-range aggregate — a file
#: rewritten with one surviving row dropped, or a non-overlapping file
#: touched and corrupted, diverges the hash.
Q178_DEL_LO, Q178_DEL_HI = 1000, 2999

Q178_SQL = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
WHERE o_orderkey NOT BETWEEN {Q178_DEL_LO} AND {Q178_DEL_HI}
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

#: q196 merge-on-read delete batches: one contiguous key range (stacks a
#: sidecar on few zone-overlapping files) and one scattered modular set
#: (touches EVERY file — the GDPR-style point-erasure shape), so the
#: face exercises both one-file and all-file sidecar attachment plus
#: sidecar STACKING on the overlap. Both riders rewrite zero data files
#: (pinned in tests/test_manifest_table.py).
Q196_DEL_LO, Q196_DEL_HI = 500, 900
Q196_MOD, Q196_REM = 131, 7

Q196_SQL = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
WHERE NOT (o_orderkey BETWEEN {Q196_DEL_LO} AND {Q196_DEL_HI})
  AND NOT (o_orderkey % {Q196_MOD} = {Q196_REM})
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

#: q198: the metadata-only aggregate must equal the plain table scan's
#: answer exactly — COUNT from per-file row counts, MIN/MAX from zone
#: maps (copied values, never arithmetic, so doubles compare bit-exact).
Q198_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM orders
"""

#: q179 fragmentation inserts: three out-of-range batches (disjoint key
#: offsets, so each merge appends files without rewriting any) — the
#: small-file/zone-overlap debt OPTIMIZE then pays down. The oracle is
#: the union aggregate: compaction + vacuum must be hash-invisible.
Q179_OFFS = (20_000_000, 30_000_000, 40_000_000)

Q179_SQL = f"""
WITH t AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  UNION ALL
  SELECT o_orderkey + {Q179_OFFS[0]}, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 89 = 0
  UNION ALL
  SELECT o_orderkey + {Q179_OFFS[1]}, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 89 = 1
  UNION ALL
  SELECT o_orderkey + {Q179_OFFS[2]}, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 89 = 2
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM t
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

#: q182 probe keys: fixed low custkeys that exist at every SF (TPC-H
#: customer keys are dense from 1); missing keys would simply yield no
#: group, so the face stays well-defined on any corpus.
Q182_KEYS = (3, 41, 77, 111, 149)

Q182_SQL = f"""
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_custkey IN {Q182_KEYS!r}
GROUP BY o_custkey
ORDER BY o_custkey
"""

#: q168 oracle is the PLAIN orders aggregate: after merge + restore the
#: table must be byte-equivalent to its first snapshot, so any leaked
#: merged row (or dropped original) diverges the hash.
Q168_SQL = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


#: q194 CDC batch: updates in the q146 range, DELETES on a key stride
#: excluded from the update range (the caller resolves to one op per key
#: — merge_cdc's contract), inserts offset past every real key.
Q194_DEL_MOD, Q194_DEL_RES = 89, 7

Q194_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey BETWEEN {Q146_UPD_LO} AND {Q146_UPD_HI}
),
dels AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderkey % {Q194_DEL_MOD} = {Q194_DEL_RES}
    AND o_orderkey NOT BETWEEN {Q146_UPD_LO} AND {Q146_UPD_HI}
),
ins AS (
  SELECT o_orderkey + {Q146_INS_OFFSET} AS o_orderkey, o_custkey,
         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 13
),
merged AS (
  SELECT * FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    AND o_orderkey NOT IN (SELECT o_orderkey FROM dels)
    AND o_orderkey NOT IN (SELECT o_orderkey FROM ins)
  UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM ins
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def _register_queries() -> None:
    from ..catalog import load_table
    from ..numeric import dsum, money
    from ..registry import register
    from .ingest import _scratch

    @register("q145_skipping_scan", Q145_SQL)
    def q145_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
        """lineitem → range-clustered ManifestTable → zone-map-pruned
        range scan → aggregate. The oracle sees none of the storage
        machinery: if clustering or pruning dropped/duplicated a row,
        the hash diverges. File-skip effectiveness is pinned separately
        (tests/test_manifest_table.py asserts pruned < total)."""
        root = _scratch("q145_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(os.path.join(root, "lineitem"), "l_orderkey")
        tbl.write(load_table(spark, sf_dir, "lineitem"), target_files=8)
        return (
            tbl.scan(spark, "l_orderkey", Q145_LO, Q145_HI)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                dsum(money("l_quantity"), "sum_qty"),
                dsum(money("l_extendedprice"), "sum_price"),
            )
            .orderBy("l_returnflag")
        )

    @register("q146_merge_upsert", Q146_SQL)
    def q146_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
        """orders → ManifestTable → one COW MERGE batch (range-local
        updates + out-of-range inserts) → read back → aggregate.
        Matched keys must be replaced exactly once and untouched files
        carried forward byte-identical for the hash to agree."""
        root = _scratch("q146_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(os.path.join(root, "orders"), "o_orderkey")
        o = load_table(spark, sf_dir, "orders")
        tbl.write(o, target_files=8)
        upd = o.filter(
            F.col("o_orderkey").between(Q146_UPD_LO, Q146_UPD_HI)
        ).select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
        )
        ins = o.filter(F.col("o_orderkey") % 97 == 13).select(
            (F.col("o_orderkey") + F.lit(Q146_INS_OFFSET)).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        tbl.merge(spark, upd.unionByName(ins))
        return (
            tbl.read(spark)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                dsum(money("o_totalprice"), "sum_price"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
            )
            .orderBy("o_orderstatus")
        )

    @register("q146b_merge_schema_evolution", Q146B_SQL)
    def q146b_merge_schema_evolution(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """q146's COW merge with the update batch carrying a NEW column
        (``o_note``) — the q137 schema-evolution story lifted to the
        managed table. The evolved schema commits with the generation;
        untouched files carry forward by reference and NULL-fill the new
        column at read, so the hash proves three things at once: the
        upsert, the zero-rewrite evolution, and the NULL semantics of
        pre-evolution rows (surfaced as note='carried')."""
        root = _scratch("q146b_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(os.path.join(root, "orders"), "o_orderkey")
        o = load_table(spark, sf_dir, "orders")
        tbl.write(o, target_files=8)
        upd = o.filter(
            F.col("o_orderkey").between(Q146_UPD_LO, Q146_UPD_HI)
        ).select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
            F.lit("adjusted").alias("o_note"),
        )
        ins = o.filter(F.col("o_orderkey") % 97 == 13).select(
            (F.col("o_orderkey") + F.lit(Q146_INS_OFFSET)).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
            F.lit("new").alias("o_note"),
        )
        tbl.merge(spark, upd.unionByName(ins))
        return (
            tbl.read(spark)
            .groupBy(
                F.coalesce(F.col("o_note"), F.lit("carried")).alias("note")
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
                dsum(money("o_totalprice"), "sum_price"),
            )
            .orderBy("note")
        )

    @register("q168_table_restore", Q168_SQL)
    def q168_table_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
        """orders → ManifestTable → COW merge (updates + inserts) →
        RESTORE to the pre-merge snapshot → read back → aggregate. The
        oracle is the PLAIN orders aggregate: restore must make the
        merge hash-invisible — one leaked upserted row, one dropped
        original, or a stale schema diverges it. The rollback is a new
        commit (metadata-only), so the merge snapshot stays readable."""
        root = _scratch("q168_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(os.path.join(root, "orders"), "o_orderkey")
        o = load_table(spark, sf_dir, "orders")
        tbl.write(o, target_files=8)
        g0 = tbl.state.current_gen()
        upd = o.filter(
            F.col("o_orderkey").between(Q146_UPD_LO, Q146_UPD_HI)
        ).select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
        )
        tbl.merge(spark, upd)
        tbl.restore(g0)
        return (
            tbl.read(spark)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                dsum(money("o_totalprice"), "sum_price"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
            )
            .orderBy("o_orderstatus")
        )

    @register("q178_table_delete", Q178_SQL)
    def q178_table_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
        """orders → ManifestTable → COW range DELETE → read back →
        aggregate. The oracle is the anti-range aggregate: only files
        whose key zone overlaps the deleted range may be rewritten
        (pinned in tests/test_manifest_table.py); every surviving row in
        them — and every byte of the untouched files — must carry
        forward exactly, or the hash diverges."""
        root = _scratch("q178_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(os.path.join(root, "orders"), "o_orderkey")
        tbl.write(load_table(spark, sf_dir, "orders"), target_files=8)
        tbl.delete(spark, "o_orderkey", Q178_DEL_LO, Q178_DEL_HI)
        return (
            tbl.read(spark)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                dsum(money("o_totalprice"), "sum_price"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
            )
            .orderBy("o_orderstatus")
        )

    @register("q196_mor_delete", Q196_SQL)
    def q196_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
        """orders → ManifestTable → TWO merge-on-read deletes (a key
        range, then a scattered modular key set — the second STACKS a
        sidecar on files the first already covers) → read back →
        aggregate. The oracle is the double-anti-predicate aggregate:
        the sidecar anti-join must hide exactly the deleted keys — a
        resurrected row, an over-deleted neighbor zone, or a lost
        stacked sidecar all diverge the hash. Zero data files are
        rewritten by either delete (files_rewritten==0 pinned in
        tests/test_manifest_table.py — the property this path exists
        for; Delta deletion vectors / Iceberg equality deletes are the
        public designs, re-expressed at the manifest level)."""
        root = _scratch("q196_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(os.path.join(root, "orders"), "o_orderkey")
        o = load_table(spark, sf_dir, "orders")
        tbl.write(o, target_files=8)
        tbl.delete_mor(
            spark,
            o.filter(
                F.col("o_orderkey").between(Q196_DEL_LO, Q196_DEL_HI)
            ).select("o_orderkey"),
        )
        tbl.delete_mor(
            spark,
            o.filter(
                F.col("o_orderkey") % Q196_MOD == Q196_REM
            ).select("o_orderkey"),
        )
        return (
            tbl.read(spark)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                dsum(money("o_totalprice"), "sum_price"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
            )
            .orderBy("o_orderstatus")
        )

    @register("q198_metadata_agg", Q198_SQL)
    def q198_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        """orders → ManifestTable (key zone maps + o_totalprice stats)
        → ``stats_agg`` — COUNT/MIN/MAX answered from the MANIFEST
        ALONE, zero data files opened (pinned in
        tests/test_manifest_table.py by deleting the data files and
        asking again). The oracle is the full-scan aggregate: if the
        writer's per-file stats ever drift from the data (a lost row, a
        zone map computed after a cast), this hash diverges. The
        stats-based answering path every table format sells; honest
        under MOR deletes by REFUSING while sidecars are pending."""
        root = _scratch("q198_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(
            os.path.join(root, "orders"),
            "o_orderkey",
            stats_cols=["o_totalprice"],
        )
        tbl.write(load_table(spark, sf_dir, "orders"), target_files=8)
        s = tbl.stats_agg()
        return spark.createDataFrame(
            [
                (
                    int(s["rows"]),
                    int(s["min_o_orderkey"]),
                    int(s["max_o_orderkey"]),
                    float(s["min_o_totalprice"]),
                    float(s["max_o_totalprice"]),
                )
            ],
            "n_rows long, min_key long, max_key long, "
            "min_price double, max_price double",
        )

    @register("q179_compact_reclaim", Q179_SQL)
    def q179_compact_reclaim(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The table-maintenance lifecycle end to end: orders →
        ManifestTable → three out-of-range insert merges (each appends
        small files and loosens zone disjointness — writer-commits-fast
        debt) → OPTIMIZE (re-range-cluster to target_files) → VACUUM
        (reclaim unreferenced files, trim expired snapshots) → read →
        aggregate. The oracle is the plain union aggregate: both
        maintenance commands are layout-only and must be hash-invisible;
        file-count mechanics are pinned separately in
        tests/test_manifest_table.py."""
        root = _scratch("q179_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(os.path.join(root, "orders"), "o_orderkey")
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        tbl.write(o, target_files=8)
        for i, off in enumerate(Q179_OFFS):
            batch = o.filter(F.col("o_orderkey") % 89 == i).select(
                (F.col("o_orderkey") + F.lit(off)).alias("o_orderkey"),
                "o_orderstatus",
                "o_totalprice",
            )
            tbl.merge(spark, batch)
        tbl.compact(spark, target_files=8)
        tbl.vacuum()
        return (
            tbl.read(spark)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                dsum(money("o_totalprice"), "sum_price"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
            )
            .orderBy("o_orderstatus")
        )

    @register("q182_bloom_point_lookup", Q182_SQL)
    def q182_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Point lookup on a NON-cluster column via per-file bloom
        filters: orders range-clustered on o_orderkey (so o_custkey zone
        maps are useless — every file spans the whole custkey domain)
        with a bloom on o_custkey; ``lookup`` consults the blooms to
        skip files, the residual IN-filter makes survivors exact. The
        oracle is the plain IN aggregate — a bloom false NEGATIVE (the
        only way a sketch can corrupt results) drops a group's rows and
        diverges the hash; skip effectiveness is pinned in
        tests/test_manifest_table.py."""
        root = _scratch("q182_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(
            os.path.join(root, "orders"),
            "o_orderkey",
            bloom_cols=["o_custkey"],
        )
        tbl.write(load_table(spark, sf_dir, "orders"), target_files=16)
        return (
            tbl.lookup(spark, "o_custkey", list(Q182_KEYS))
            .groupBy(F.col("o_custkey").cast("bigint").alias("o_custkey"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                dsum(money("o_totalprice"), "sum_price"),
            )
            .orderBy("o_custkey")
        )

    @register("q194_cdc_apply", Q194_SQL)
    def q194_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
        """orders → ManifestTable → ONE CDC batch mixing all three ops
        (updates in a key range, per-key DELETES on a stride, inserts
        past every real key) applied via ``merge_cdc`` in one COW pass /
        one commit → read back → aggregate. The oracle applies the same
        change semantics to the base table in SQL — a resurrected
        deleted row, a dropped survivor, or a double-applied update all
        diverge the hash. Completes the storage DML matrix: q146 upsert,
        q178 range delete, q194 keyed CDC with deletes (the Delta MERGE
        WHEN MATCHED THEN DELETE shape); file-level COW mechanics and
        replay idempotence pinned in tests/test_manifest_table.py."""
        root = _scratch("q194_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(os.path.join(root, "orders"), "o_orderkey")
        o = load_table(spark, sf_dir, "orders")
        tbl.write(o, target_files=8)
        upd = o.filter(
            F.col("o_orderkey").between(Q146_UPD_LO, Q146_UPD_HI)
        ).select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
            F.lit("U").alias("op"),
        )
        dels = o.filter(
            (F.col("o_orderkey") % Q194_DEL_MOD == Q194_DEL_RES)
            & ~F.col("o_orderkey").between(Q146_UPD_LO, Q146_UPD_HI)
        ).select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
            F.lit("D").alias("op"),
        )
        ins = o.filter(F.col("o_orderkey") % 97 == 13).select(
            (F.col("o_orderkey") + F.lit(Q146_INS_OFFSET)).alias(
                "o_orderkey"
            ),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
            F.lit("I").alias("op"),
        )
        tbl.merge_cdc(spark, upd.unionByName(dels).unionByName(ins))
        return (
            tbl.read(spark)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                dsum(money("o_totalprice"), "sum_price"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
            )
            .orderBy("o_orderstatus")
        )


Q149_SQL = """
WITH b AS (
  SELECT CAST(MAX(l_partkey) // 4 AS BIGINT) AS plo,
         CAST(MAX(l_partkey) // 2 AS BIGINT) AS phi,
         CAST(MAX(l_suppkey) // 4 AS BIGINT) AS slo,
         CAST(MAX(l_suppkey) // 2 AS BIGINT) AS shi
  FROM lineitem
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM lineitem, b
WHERE l_partkey BETWEEN b.plo AND b.phi
  AND l_suppkey BETWEEN b.slo AND b.shi
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


#: q150 delete range — disjoint from the q146-style update range so each
#: changed key has exactly one change type.
Q150_DEL_LO, Q150_DEL_HI = 800, 899

Q150_SQL = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey BETWEEN {Q146_UPD_LO} AND {Q146_UPD_HI}
),
ins AS (
  SELECT o_orderkey + {Q146_INS_OFFSET} AS o_orderkey, o_custkey,
         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 13
),
del AS (
  SELECT * FROM orders
  WHERE o_orderkey BETWEEN {Q150_DEL_LO} AND {Q150_DEL_HI}
),
changes AS (
  SELECT 'update' AS change_type, * FROM upd
  UNION ALL SELECT 'insert', * FROM ins
  UNION ALL SELECT 'delete', * FROM del
)
SELECT change_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM changes
GROUP BY change_type
ORDER BY change_type
"""


def _register_q150() -> None:
    from ..catalog import load_table
    from ..numeric import dsum, money
    from ..registry import register
    from .ingest import _scratch

    @register("q150_table_changes", Q150_SQL)
    def q150_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Change data feed: orders → ManifestTable → one COW merge
        (range updates + out-of-range inserts) → one range delete →
        snapshot diff of the first generation against the current one.
        The diff must recover EXACTLY the applied changes — rewritten-
        but-unchanged rows (COW carries them into new files) have to
        cancel out, shared files are skipped by manifest file-id
        equality, and each change row carries its post-image (pre-image
        for deletes)."""
        root = _scratch("q150_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(os.path.join(root, "orders"), "o_orderkey")
        o = load_table(spark, sf_dir, "orders")
        tbl.write(o, target_files=8)
        g0 = tbl.state.current_gen()
        upd = o.filter(
            F.col("o_orderkey").between(Q146_UPD_LO, Q146_UPD_HI)
        ).select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
        )
        ins = o.filter(F.col("o_orderkey") % 97 == 13).select(
            (F.col("o_orderkey") + F.lit(Q146_INS_OFFSET)).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        tbl.merge(spark, upd.unionByName(ins))
        tbl.delete(spark, "o_orderkey", Q150_DEL_LO, Q150_DEL_HI)
        return (
            tbl.table_changes(spark, g0)
            .groupBy(F.col("_change_type").alias("change_type"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
                dsum(money("o_totalprice"), "sum_price"),
            )
            .orderBy("change_type")
        )


def _register_q149() -> None:
    from ..catalog import load_table
    from ..numeric import dsum, money
    from ..registry import register
    from .ingest import _scratch

    @register("q149_zorder_table_scan", Q149_SQL)
    def q149_zorder_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Multi-dimension data skipping: lineitem laid out on a Morton
        key over (l_partkey, l_suppkey) (plans/zorder.py — the
        oracle-verified bit interleave), zone maps collected on BOTH
        dimensions, then a box predicate pruning files on both at once —
        Delta's OPTIMIZE ZORDER BY lifted to the manifest level. The box
        bounds derive from the key maxima by integer division so the
        same static oracle SQL covers every SF. File-skip effectiveness
        is pytest-pinned (a box of ~1/16 the area must skip most of the
        16 files)."""
        from ..plans.zorder import zvalue

        root = _scratch("q149_mtable_")
        shutil.rmtree(root, ignore_errors=True)
        li = load_table(spark, sf_dir, "lineitem")
        st = li.agg(
            F.min("l_partkey").alias("pmn"),
            F.max("l_partkey").alias("pmx"),
            F.min("l_suppkey").alias("smn"),
            F.max("l_suppkey").alias("smx"),
        ).collect()[0]
        tbl = ManifestTable(
            os.path.join(root, "lineitem"),
            "l_partkey",
            stats_cols=["l_suppkey"],
        )
        dims = [
            (F.col("l_partkey"), F.lit(st["pmn"]), F.lit(st["pmx"])),
            (F.col("l_suppkey"), F.lit(st["smn"]), F.lit(st["smx"])),
        ]
        tbl.write(li, target_files=16, cluster_by=zvalue(dims))
        plo, phi = st["pmx"] // 4, st["pmx"] // 2
        slo, shi = st["smx"] // 4, st["smx"] // 2
        return (
            tbl.scan_box(
                spark,
                {"l_partkey": (plo, phi), "l_suppkey": (slo, shi)},
            )
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.countDistinct("l_suppkey").cast("bigint").alias("n_supp"),
                dsum(money("l_extendedprice"), "sum_price"),
            )
            .orderBy("l_returnflag")
        )


_register_queries()
_register_q150()
_register_q149()
