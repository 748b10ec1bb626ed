"""Layout advisor: WHICH column should a table range-cluster by?

``sources.manifest_table`` implements the mechanism (disjoint per-file
zones → zone-map pruning, q145/q149/q182); this face quantifies the
POLICY question a table owner actually faces: for a workload of range
probes over several columns, how many files would each candidate layout
let the scanner skip? The readout is the full layout × probe matrix —
the diagonal (cluster by the probed column) shows ~all files skipped,
off-diagonal shows zone maps degenerating to full scans when files are
ordered by something else. Same decision Delta/Iceberg OPTIMIZE
CLUSTER BY tooling informs; here it is an oracle-verified query.

Determinism: the real writer places files with ``repartitionByRange``,
whose boundaries come from reservoir sampling — correct but not
reproducible in another engine. The advisor therefore SIMULATES the
layout it scores with exact rank arithmetic: file(row) =
(rank−1)·N_FILES DIV n under the total order (candidate, orderkey).
That is the same disjoint-zone placement the writer converges to, and
both engines can compute it bit-identically. At 100 TB the advisor runs
on a sample of the table (placement share estimates converge at modest
sample sizes); the simulation cost here is one keyed exchange + one
bucket-partitioned rank per candidate (the q183/q187 two-phase prefix
pattern — no single-partition sort of the fact table, plan-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .skew import _skew_bucket_case

#: Simulated layout: files per candidate layout, range probes per
#: probed column (probe k covers the k-th 1/N_PROBES of the observed
#: domain — uniform coverage, integer bounds).
ADV_FILES = 16
ADV_PROBES = 8

#: Candidate columns: (name, DuckDB integer expression). All strictly
#: positive BIGINTs so the q187 value-bucket ladder applies directly.
ADV_COLS = (
    ("orderkey", "o_orderkey"),
    ("custkey", "o_custkey"),
    ("day", "DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) + 1"),
    ("cents", "CAST(ROUND(o_totalprice * 100) AS BIGINT)"),
)


#: q190b sampling rate: the md5-deterministic row sample the 100 TB
#: path runs the advisor on (placement shares converge long before
#: exactness matters — the module docstring's claim, now CODED and
#: oracle-verified at this rate rather than documented prose).
ADV_SAMPLE_PPM = 250_000


def _q190_sql(sample_ppm: int | None = None) -> str:
    """Generated oracle: one ranked CTE per candidate layout (global
    ROW_NUMBER is the semantic spec of the two-phase rank), zones per
    simulated file, probe grid per probed column, overlap matrix.
    ``sample_ppm`` prepends the md5-deterministic row filter (the q87
    shard idiom — engine-identical md5 of the key's decimal string)."""
    base_cols = ",\n         ".join(
        f"CAST({expr} AS BIGINT) AS {name}" for name, expr in ADV_COLS
    )
    where = (
        f"\n  WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR))"
        f", 1, 6)) AS BIGINT) % 1000000 < {sample_ppm}"
        if sample_ppm is not None
        else ""
    )
    names = [name for name, _ in ADV_COLS]
    zone_ctes = []
    for lname in names:
        mins = ", ".join(
            f"MIN({p}) AS zmin_{p}, MAX({p}) AS zmax_{p}" for p in names
        )
        zone_ctes.append(
            f"""z_{lname} AS (
  SELECT '{lname}' AS layout, fid, {mins}
  FROM (
    SELECT *, (ROW_NUMBER() OVER (ORDER BY {lname}, orderkey) - 1)
              * {ADV_FILES} // (SELECT COUNT(*) FROM base) AS fid
    FROM base
  ) GROUP BY fid
)"""
        )
    zone_union = " UNION ALL ".join(f"SELECT * FROM z_{n}" for n in names)
    zone_unpivot = " UNION ALL ".join(
        f"SELECT layout, fid, '{p}' AS probe, zmin_{p} AS zmin,"
        f" zmax_{p} AS zmax FROM zones"
        for p in names
    )
    dom_union = " UNION ALL ".join(
        f"SELECT '{p}' AS probe, MIN({p}) AS dmin, MAX({p}) AS dmax"
        f" FROM base"
        for p in names
    )
    return f"""
WITH base AS (
  SELECT {base_cols} FROM orders{where}
),
{','.join(zone_ctes)},
zones AS ({zone_union}),
zcol AS ({zone_unpivot}),
doms AS ({dom_union}),
probes AS (
  SELECT probe,
         k,
         dmin + (dmax - dmin) * k // {ADV_PROBES} AS lo,
         dmin + (dmax - dmin) * (k + 1) // {ADV_PROBES} AS hi
  FROM doms, (SELECT UNNEST(range({ADV_PROBES})) AS k)
)
SELECT z.layout,
       z.probe,
       CAST(COUNT(DISTINCT z.fid) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN z.zmax < p.lo OR z.zmin > p.hi
                     THEN 0 ELSE 1 END) AS BIGINT) AS files_kept,
       CAST((COUNT(*) - SUM(CASE WHEN z.zmax < p.lo OR z.zmin > p.hi
                                 THEN 0 ELSE 1 END)) * 1000000
            // COUNT(*) AS BIGINT) AS skip_ppm
FROM zcol z JOIN probes p USING (probe)
GROUP BY z.layout, z.probe
ORDER BY z.layout, z.probe
"""


def _layout_matrix(
    spark: SparkSession, sf_dir: str, sample_ppm: int | None = None
) -> DataFrame:
    """Shared body of q190/q190b — see q190_layout_advisor. When
    ``sample_ppm`` is set, the whole simulation runs on the
    md5-deterministic row sample (keep iff md5(orderkey) % 1e6 < ppm),
    so the sampled matrix is itself hash-exact cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    names = [name for name, _ in ADV_COLS]
    base = o.select(
        F.col("o_orderkey").cast("long").alias("orderkey"),
        F.col("o_custkey").cast("long").alias("custkey"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
            + 1
        )
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    if sample_ppm is not None:
        base = base.filter(
            F.conv(
                F.substring(
                    F.md5(F.col("orderkey").cast("string")), 1, 6
                ),
                16,
                10,
            ).cast("long")
            % 1_000_000
            < sample_ppm
        )
    # The narrow (4 BIGINTs/row) base feeds FOUR layout branches (bucket
    # agg + rank join each), the domain min/max, and the total count —
    # and Spark never reuses self-join subtrees (the q107 lesson), so
    # without materialization the orders scan + projection (+ md5 sample
    # filter for q190b) re-ran 16× per query. One lazy localCheckpoint
    # runs it once; every branch reads the checkpoint (measured: q190
    # 6.3 → 4.4 s, q190b 5.0 → 4.1 s isolated at sf0.1; parquet scans
    # 16 → 0 in the plan — OPTIMIZATION_r12.md change 1).
    base = base.localCheckpoint(eager=False)
    n_total = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    zone_parts = []
    for lname in names:
        b = base.withColumn(
            "bucket", F.expr(_skew_bucket_case(lname, "DIV")).cast("long")
        )
        bkeys = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("nk"))
        woff = Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = bkeys.select(
            "bucket",
            F.coalesce(F.sum("nk").over(woff), F.lit(0)).alias("off"),
        )
        ranked = (
            b.join(F.broadcast(offsets), "bucket")
            .join(F.broadcast(n_total))
            .select(
                *names,
                F.expr(
                    f"(off + row_number() OVER (PARTITION BY bucket"
                    f" ORDER BY {lname}, orderkey) - 1)"
                    f" * {ADV_FILES} DIV n"
                ).alias("fid"),
            )
        )
        zone_parts.append(
            ranked.groupBy("fid").agg(
                *[
                    m
                    for p in names
                    for m in (
                        F.min(p).alias(f"zmin_{p}"),
                        F.max(p).alias(f"zmax_{p}"),
                    )
                ]
            )
            .select(F.lit(lname).alias("layout"), "*")
        )
    zones = zone_parts[0]
    for zp in zone_parts[1:]:
        zones = zones.unionByName(zp)
    stack = ", ".join(
        f"'{p}', zmin_{p}, zmax_{p}" for p in names
    )
    zcol = zones.select(
        "layout",
        "fid",
        F.expr(
            f"stack({len(names)}, {stack}) AS (probe, zmin, zmax)"
        ),
    )
    # All four probe domains in ONE aggregate pass (was one agg — and one
    # base scan — per column), unpivoted with stack; same values, order
    # irrelevant (probes join by key).
    dom_stack = ", ".join(f"'{p}', dmin_{p}, dmax_{p}" for p in names)
    doms = base.agg(
        *[
            m
            for p in names
            for m in (
                F.min(p).alias(f"dmin_{p}"),
                F.max(p).alias(f"dmax_{p}"),
            )
        ]
    ).select(
        F.expr(f"stack({len(names)}, {dom_stack}) AS (probe, dmin, dmax)")
    )
    probes = doms.select(
        "probe",
        F.explode(F.sequence(F.lit(0), F.lit(ADV_PROBES - 1))).alias("k"),
        "dmin",
        "dmax",
    ).select(
        "probe",
        "k",
        F.expr(f"dmin + (dmax - dmin) * k DIV {ADV_PROBES}").alias("lo"),
        F.expr(f"dmin + (dmax - dmin) * (k + 1) DIV {ADV_PROBES}").alias(
            "hi"
        ),
    )
    kept = F.when(
        (F.col("zmax") < F.col("lo")) | (F.col("zmin") > F.col("hi")),
        F.lit(0),
    ).otherwise(F.lit(1))
    return (
        zcol.join(F.broadcast(probes), "probe")
        .groupBy("layout", "probe")
        .agg(
            F.countDistinct("fid").cast("long").alias("n_files"),
            F.sum(kept).cast("long").alias("files_kept"),
            F.expr(
                f"CAST((count(*) - sum(CASE WHEN zmax < lo OR zmin > hi"
                f" THEN 0 ELSE 1 END)) * 1000000 DIV count(*) AS BIGINT)"
            ).alias("skip_ppm"),
        )
        .orderBy("layout", "probe")
    )


@register("q190_layout_advisor", _q190_sql())
def q190_layout_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layout × probe skip matrix over orders: for every candidate
    range-clustering column and every probed column, the fraction of
    simulated files (in ppm) a zone-map scan would skip under a uniform
    grid of ADV_PROBES domain-range probes. Read the row for your
    workload's probe column; the argmax layout is the CLUSTER BY
    recommendation (and the off-diagonal ~0 rows are the proof that
    clustering by anything else buys nothing — the q182 bloom face
    exists precisely for those columns).

    Exactness: placement is rank arithmetic (module docstring), zones
    and probe bounds are integer min/max and DIV grids, the skip ratio
    a scaled integer — hash-exact end to end.

    Scale: per candidate, one value-bucketed two-phase prefix rank
    (q187's ladder — bucket-partitioned window, offsets broadcast; no
    single-partition fact sort) feeding a fid-keyed min/max aggregate;
    everything after the zone aggregates is bounded
    (layouts × files × probes rows). Four candidates = four passes —
    this exact face keeps the full table for the oracle; q190b is the
    CODED 100 TB path (md5-deterministic sample, itself oracle-exact)."""
    return _layout_matrix(spark, sf_dir)


@register("q190b_layout_advisor_sampled", _q190_sql(ADV_SAMPLE_PPM))
def q190b_layout_advisor_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q190's matrix computed on the md5-deterministic ADV_SAMPLE_PPM
    row sample — the production path at 100 TB (the advisor is a POLICY
    readout; placement shares converge long before exactness matters,
    and the q176b discipline applies: a documented scale mitigation must
    be code, not prose). The sample predicate is md5(orderkey) — the
    q87/q85 split idiom — so the sampled matrix is bit-identical
    cross-engine and the oracle verifies the SAMPLED computation
    itself; the policy signal (diagonal ≈ full skip, off-diagonal ≈ 0)
    is pinned to agree with the exact face in tests."""
    return _layout_matrix(spark, sf_dir, ADV_SAMPLE_PPM)
