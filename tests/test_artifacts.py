"""Shared cluster-labels artifact: hash-invisible reuse of q80's output."""

from __future__ import annotations

import os
import shutil
import tempfile

from redix_stream_spark.llm import artifacts
from redix_stream_spark.llm.artifacts import (
    ARTIFACT_PREFIX,
    cluster_labels,
    corpus_fingerprint,
)
from redix_stream_spark.llm.dedup import neardup_clusters


def _clear_artifacts():
    base = tempfile.gettempdir()
    for name in os.listdir(base):
        if name.startswith(ARTIFACT_PREFIX):
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)


def test_artifact_matches_inline_computation(spark, sf_dir):
    """The materialized labels are value-identical to neardup_clusters —
    the artifact must be hash-invisible to every consumer."""
    _clear_artifacts()
    direct = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in neardup_clusters(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).collect()
    }
    via_artifact = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in cluster_labels(spark, sf_dir).collect()
    }
    assert via_artifact == direct


def test_artifact_built_once_then_reused(spark, sf_dir, monkeypatch):
    """The second consumer call must NOT re-run the clustering pipeline."""
    _clear_artifacts()
    calls = []
    real = neardup_clusters

    def counting(d):
        calls.append(1)
        return real(d)

    monkeypatch.setattr(
        "redix_stream_spark.llm.dedup.neardup_clusters", counting
    )
    cluster_labels(spark, sf_dir).count()
    cluster_labels(spark, sf_dir).count()
    assert len(calls) == 1


def test_fingerprint_tracks_corpus_changes(sf_dir, tmp_path):
    """A rewritten corpus (same name, different bytes/mtime) gets a new
    fingerprint — stale labels can never be served."""
    src = os.path.join(sf_dir, "documents.parquet")
    d1 = tmp_path / "a"
    d1.mkdir()
    shutil.copy(src, d1 / "documents.parquet")
    fp1 = corpus_fingerprint(str(d1))
    os.utime(d1 / "documents.parquet", ns=(1, 1))
    assert corpus_fingerprint(str(d1)) != fp1


def test_stale_fingerprint_dirs_are_swept(sf_dir):
    """Only the live corpus fingerprint keeps an artifact dir (bounded
    disk, the _scratch discipline)."""
    base = tempfile.gettempdir()
    stale = os.path.join(base, f"{ARTIFACT_PREFIX}deadbeefdeadbeef")
    os.makedirs(stale, exist_ok=True)
    artifacts._artifact_root(corpus_fingerprint(sf_dir))
    assert not os.path.exists(stale)
