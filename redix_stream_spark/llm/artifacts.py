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


def corpus_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Deterministic fingerprint of a parquet table's files: md5 over
    (relative name, size, mtime_ns) of every data file. Cheap (stat-only,
    no reads) and conservative — any rewrite changes the fingerprint."""
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
    h = hashlib.md5(repr(sorted(entries)).encode()).hexdigest()
    return h[:16]


def _artifact_root(fingerprint: str) -> str:
    """One dir per corpus fingerprint, bounded at ARTIFACT_KEEP live
    corpora: entering a fingerprint refreshes its mtime and sweeps the
    oldest siblings past the cap (LRU, the ``_scratch`` bounded-disk
    discipline — a rewritten corpus's stale labels age out and can never
    be served anyway, the fingerprint no longer matches)."""
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
        key=lambda p: os.path.getmtime(p),
    )
    for p in siblings[: max(0, len(siblings) - (ARTIFACT_KEEP - 1))]:
        shutil.rmtree(p, ignore_errors=True)
    return keep


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
    from ..catalog import load_table
    from ..sources.manifest_table import ManifestTable
    from .dedup import neardup_clusters

    root = _artifact_root(corpus_fingerprint(sf_dir))
    table = ManifestTable(root, key="doc_id")
    if not table.generations():
        labels = neardup_clusters(load_table(spark, sf_dir, "documents"))
        table.write(labels, target_files=4)
    return table.read(spark)
