"""Shared corpus artifacts: expensive derived relations materialized ONCE
per corpus and reused by every consumer.

Near-dup clustering (q80) is the most expensive corpus operation in the
engine — MinHash signatures, banded candidate join, exact Jaccard, then
an iterative label propagation. Before this module, every consumer
(q81 clean-corpus, q118 leakage-safe split) recomputed that whole
pipeline inline; at 100 TB that is the difference between running the
costliest job in the system once versus once per downstream face.

The production shape (what Delta/Iceberg pipelines do): land the labels
in a managed table and JOIN them. ``cluster_labels`` materializes q80's
output into a :class:`~..sources.manifest_table.ManifestTable` keyed by
``doc_id``, keyed on a **corpus fingerprint** (file names, sizes and
mtimes of the documents parquet) so a changed corpus can never serve
stale labels — the artifact is rebuilt exactly when its input changed,
and hash-identical to the inline computation otherwise. Consumers'
oracles are untouched: the artifact is hash-invisible (the q158 salting
discipline — an execution-strategy change must never show up in
results).

Reference parity note: the reference engine (hayesgm/redix_stream,
consumer.ex) has no derived-artifact layer at all; this is part of the
brief's "operations a large-scale training-data pipeline would need".
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

ARTIFACT_PREFIX = "redix_cluster_labels_"

#: Distinct corpora whose artifacts coexist before the oldest is swept.
#: A session legitimately touches several scale factors (sf0.001 tests,
#: sf0.01 driver, sf0.1 + 10x replica bench) — sweeping all-but-one made
#: the bench's scale alternation rebuild the artifact it had just built.
ARTIFACT_KEEP = 4


def _pipeline_digest() -> str:
    """Digest of the clustering parameters baked into the artifact.

    The fingerprint must cover BOTH inputs of the materialized labels:
    the corpus bytes AND the pipeline that derived them. Without this,
    changing PERM_PARAMS / N_BANDS / SHINGLE_K / JACCARD_THRESHOLD
    serves stale labels from a warm /tmp artifact — loud in
    oracle-checked paths, silently wrong in bench timings (ADVICE r6)."""
    from .dedup import (
        JACCARD_THRESHOLD,
        N_BANDS,
        PERM_PARAMS,
        PROD_BANDS,
        PROD_PERM_PARAMS,
        SHINGLE_K,
    )

    return hashlib.md5(
        repr(
            (
                PERM_PARAMS,
                N_BANDS,
                SHINGLE_K,
                JACCARD_THRESHOLD,
                PROD_PERM_PARAMS,
                PROD_BANDS,
            )
        ).encode()
    ).hexdigest()


def corpus_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Deterministic fingerprint of a parquet table's files AND the
    clustering parameters: md5 over (relative name, size, mtime_ns) of
    every data file plus :func:`_pipeline_digest`. Cheap (stat-only, no
    reads) and conservative — any corpus rewrite or parameter change
    invalidates the artifact."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    entries = []
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            for name in sorted(names):
                p = os.path.join(root, name)
                st = os.stat(p)
                entries.append((os.path.relpath(p, path), st.st_size, st.st_mtime_ns))
    else:
        st = os.stat(path)
        entries.append((os.path.basename(path), st.st_size, st.st_mtime_ns))
    h = hashlib.md5(
        (repr(sorted(entries)) + _pipeline_digest()).encode()
    ).hexdigest()
    return h[:16]


def _artifact_root(fingerprint: str) -> str:
    """One dir per corpus fingerprint, bounded at ARTIFACT_KEEP live
    corpora: entering a fingerprint refreshes its mtime and sweeps the
    oldest siblings past the cap (LRU, the ``_scratch`` bounded-disk
    discipline — a rewritten corpus's stale labels age out and can never
    be served anyway, the fingerprint no longer matches)."""
    def _mtime_or_zero(p: str) -> float:
        try:
            return os.path.getmtime(p)
        except OSError:
            return 0.0

    base = tempfile.gettempdir()
    keep = os.path.join(base, f"{ARTIFACT_PREFIX}{fingerprint}")
    os.makedirs(keep, exist_ok=True)
    os.utime(keep)
    siblings = sorted(
        (
            p
            for name in os.listdir(base)
            if name.startswith(ARTIFACT_PREFIX)
            and (p := os.path.join(base, name)) != keep
        ),
        # A concurrent session (or tmp cleanup) can remove a sibling
        # between the listdir and this stat — missing dirs sort oldest
        # and the rmtree below is already ignore_errors (ADVICE r6).
        key=lambda p: _mtime_or_zero(p),
    )
    for p in siblings[: max(0, len(siblings) - (ARTIFACT_KEEP - 1))]:
        shutil.rmtree(p, ignore_errors=True)
    return keep


def _tables(spark: SparkSession, sf_dir: str):
    """(labels, bands) ManifestTables for the corpus, built on miss.

    ONE build populates both: labels are the CC output; bands are the
    (doc_id, band_key) LSH index relation the pair join consumed — the
    piece incremental refresh needs so OLD docs' signatures are never
    recomputed. Both doc_id-keyed (zone-mapped point lookups/joins)."""
    from ..catalog import load_table
    from ..sources.manifest_table import ManifestTable
    from .dedup import (
        JACCARD_THRESHOLD,
        _sym_edges,
        banded_keys,
        exact_jaccard,
        lsh_candidate_pairs,
        minhash_signatures,
        propagate_min_labels,
    )
    from pyspark.sql import functions as F

    root = _artifact_root(corpus_fingerprint(sf_dir))
    labels_t = ManifestTable(os.path.join(root, "labels"), key="doc_id")
    bands_t = ManifestTable(os.path.join(root, "bands"), key="doc_id")
    if not labels_t.generations():
        d = load_table(spark, sf_dir, "documents")
        sig = minhash_signatures(d).cache()
        bands = banded_keys(sig)
        pairs = (
            exact_jaccard(d, lsh_candidate_pairs(sig))
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_id_a", "doc_id_b")
        )
        labels = propagate_min_labels(_sym_edges(pairs))
        # Bands land FIRST: the rebuild gate is labels_t.generations(),
        # so the gate table must commit LAST — a crash between the two
        # writes then leaves a retryable miss, never a half-built
        # artifact that passes the gate with empty bands (ADVICE r6).
        bands_t.write(bands, target_files=4)
        labels_t.write(labels, target_files=4)
    return labels_t, bands_t


def cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster labels (doc_id, cluster_id, is_canonical) for
    ``sf_dir``'s documents corpus — materialized once per corpus
    fingerprint, served from the ManifestTable on every later call.

    The first call per corpus runs q80's full pipeline and lands the
    labels range-clustered on doc_id (zone-mapped files — downstream
    doc_id-keyed joins and point lookups prune); every subsequent call
    is a parquet scan of a pairs-sized relation. Consumers must treat
    the result exactly like ``neardup_clusters(d)`` output — same
    schema, same values (pinned in tests/test_artifacts.py).
    """
    labels_t, _ = _tables(spark, sf_dir)
    return labels_t.read(spark)


def corpus_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted (doc_id, band_key) LSH index for the corpus —
    built by the same artifact miss as the labels."""
    _, bands_t = _tables(spark, sf_dir)
    return bands_t.read(spark)


def production_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified production-width near-dup PAIRS (doc_id_a, doc_id_b,
    jaccard) — q36b's exact 64-perm/16-band pipeline output, materialized
    once per corpus fingerprint (round 11, VERDICT r10 item 2: q207
    rebuilt this relation inline, the recompute class this module was
    built to kill — the labels artifact persists demo-width *labels*, so
    provenance faces that need production-width *pairs* had nothing to
    read).

    Consumers (q207's source matrix; any future provenance/lineage face)
    see exactly the inline pipeline's values — parquet round-trips the
    jaccard double bit-for-bit, pinned value-for-value in
    tests/test_artifacts.py — so oracles stay untouched (hash-invisible,
    q166's contract). The fingerprint covers PROD_PERM_PARAMS/PROD_BANDS
    via ``_pipeline_digest``; a width change rebuilds rather than serving
    stale pairs. Keyed on doc_id_a: doc-keyed probes zone-prune."""
    from ..sources.manifest_table import ManifestTable
    from .dedup import PROD_BANDS, PROD_PERM_PARAMS, _minhash_neardup_pipeline

    root = _artifact_root(corpus_fingerprint(sf_dir))
    pairs_t = ManifestTable(os.path.join(root, "prod_pairs"), key="doc_id_a")
    if not pairs_t.generations():
        pairs = _minhash_neardup_pipeline(
            spark, sf_dir, params=PROD_PERM_PARAMS, n_bands=PROD_BANDS
        )
        pairs_t.write(pairs, target_files=4)
    return pairs_t.read(spark)


def incremental_cluster_labels(
    spark: SparkSession, sf_dir: str, new_docs: DataFrame
) -> DataFrame:
    """Cluster labels for (base corpus ∪ ``new_docs``) computed
    INCREMENTALLY — the refresh path a growing 100 TB corpus runs per
    ingest batch instead of re-clustering from scratch.

    What is and is not recomputed:
    - new docs: signatures + band keys (batch-sized map work);
    - candidate pairs: new-bands probed against the PERSISTED band
      index ∪ new-bands — old docs' signatures are never re-derived,
      and old↔old candidates are never re-generated (bucket equality is
      pairwise, so adding docs cannot create or destroy old↔old
      candidates);
    - verification: exact Jaccard only for pairs involving a new doc;
    - connectivity: label propagation over the NEW edges plus the old
      labels compressed to STAR edges (doc→cluster_id) — each old
      cluster participates as one supernode, which preserves components
      exactly, including the case where one new doc BRIDGES two old
      clusters into one.
    Equivalence to the from-scratch recompute on the union corpus is
    hash-checked by q173's oracle and pinned value-for-value in
    tests/test_artifacts.py.
    """
    from ..catalog import load_table
    from .dedup import (
        JACCARD_THRESHOLD,
        _sym_edges,
        banded_keys,
        exact_jaccard,
        minhash_signatures,
        propagate_min_labels,
    )
    from pyspark.sql import functions as F

    labels_old = cluster_labels(spark, sf_dir)
    bands_old = corpus_bands(spark, sf_dir)
    bands_new = banded_keys(minhash_signatures(new_docs))
    all_bands = bands_old.unionByName(bands_new)
    cand = (
        bands_new.alias("a")
        .join(
            all_bands.hint("shuffle_hash").alias("b"),
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_id_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_id_b"),
        )
        .distinct()
        # feeds the participant set AND the verify join — materialize
        # once (lazy; narrow 2-string rows) instead of re-probing the
        # band index per consumer (the r10 rule).
        .localCheckpoint(eager=False)
    )
    combined = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).unionByName(new_docs.select("doc_id", "text"))
    # Shingle only candidate PARTICIPANTS: exact_jaccard reads docs via
    # the pair join anyway, but its sets relation would otherwise map
    # the whole combined corpus — this semi-join keeps the verify stage
    # batch-neighborhood-sized, the point of being incremental. (At
    # even larger scale the shingle sets become a persisted artifact
    # themselves, exact_jaccard's own docstring note.)
    participants = cand.select(
        F.explode(F.array("doc_id_a", "doc_id_b")).alias("doc_id")
    ).distinct()
    new_pairs = (
        exact_jaccard(combined.join(participants, "doc_id", "left_semi"), cand)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_id_a", "doc_id_b")
    )
    star = labels_old.select(
        F.col("doc_id").alias("doc_id_a"), F.col("cluster_id").alias("doc_id_b")
    ).filter(F.col("doc_id_a") != F.col("doc_id_b"))
    return propagate_min_labels(
        _sym_edges(new_pairs.unionByName(star))
    )
