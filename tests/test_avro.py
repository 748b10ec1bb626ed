"""Avro OCF codec (sources/avro.py): python round-trips over the full
scalar type matrix, container-level corruption detection, distributed
read/write through mapInArrow, and — the compliance evidence the media
codecs can't have — BOTH-WAYS interop with the independent Java Avro
implementation (avro-1.12.1.jar on Spark's classpath, driven via py4j).
"""

from __future__ import annotations

import datetime
import io
import math
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from redix_stream_spark.sources.avro import (
    read_avro,
    read_avro_file,
    read_avro_header,
    spark_schema_to_avro,
    write_avro,
    write_avro_file,
)

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "b", "type": "boolean"},
        {"name": "by", "type": "bytes"},
        {"name": "nl", "type": ["null", "long"]},
    ],
}
ROWS = [
    (1, -7, 3.25, 1.5, "hello", True, b"\x00\xff", None),
    (-(2**62), 2**31 - 1, -0.0, -2.0, None, False, b"", 42),
    (2**62, -(2**31), math.pi, 0.5, "naïve ünïcode", True, b"xyz", -1),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_python_roundtrip_all_scalars(codec):
    buf = io.BytesIO()
    n = write_avro_file(buf, SCHEMA, ROWS, codec=codec)
    assert n == len(ROWS)
    schema, back = read_avro_file(buf.getvalue())
    assert schema == SCHEMA
    assert back == ROWS


def test_block_framing_and_multiblock():
    buf = io.BytesIO()
    rows = [(k, k, 0.0, 0.0, str(k), k % 2 == 0, b"", None) for k in range(1000)]
    write_avro_file(buf, SCHEMA, rows, block_records=64)
    _, back = read_avro_file(buf.getvalue())
    assert back == rows


def test_sync_marker_corruption_detected():
    buf = io.BytesIO()
    write_avro_file(buf, SCHEMA, ROWS)
    data = bytearray(buf.getvalue())
    data[-1] ^= 0xFF  # trailing sync marker byte
    with pytest.raises(ValueError, match="sync marker mismatch"):
        read_avro_file(bytes(data))
    with pytest.raises(ValueError, match="bad magic"):
        read_avro_header(b"PAR1" + bytes(data))


def test_java_library_reads_our_files(spark, tmp_path):
    """Spec compliance, direction 1: files written by the stdlib codec
    must be readable by the independent Java Avro implementation —
    including the deflate codec and nullable unions."""
    jvm = spark._jvm
    for codec in ("null", "deflate"):
        path = str(tmp_path / f"ours_{codec}.avro")
        with open(path, "wb") as fh:
            write_avro_file(fh, SCHEMA, ROWS, codec=codec)
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        assert reader.getMetaString("avro.codec") == codec
        got = []
        while reader.hasNext():
            rec = reader.next()
            got.append(
                (
                    rec.get("l"),
                    rec.get("i"),
                    rec.get("d"),
                    None if rec.get("s") is None else rec.get("s").toString(),
                    rec.get("b"),
                    rec.get("nl"),
                )
            )
        reader.close()
        want = [(r[0], r[1], r[2], r[4], r[5], r[7]) for r in ROWS]
        assert got == want, codec


def test_we_read_java_written_file(spark, tmp_path):
    """Spec compliance, direction 2: a file produced by the Java Avro
    library decodes bit-exactly with the stdlib reader."""
    import json

    jvm = spark._jvm
    schema = {
        "type": "record",
        "name": "jrow",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "v", "type": "double"},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    path = str(tmp_path / "theirs.avro")
    writer.create(jschema, jvm.java.io.File(path))
    rows = [(10**15, 2.5, "a"), (-5, -1.25, None), (0, 0.0, "ζ")]
    for k, v, s in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        rec.put("k", jvm.java.lang.Long.valueOf(k))
        rec.put("v", jvm.java.lang.Double.valueOf(v))
        rec.put("s", s)
        writer.append(rec)
    writer.close()
    with open(path, "rb") as fh:
        got_schema, got = read_avro_file(fh.read())
    assert [f["name"] for f in got_schema["fields"]] == ["k", "v", "s"]
    assert got == rows


def test_distributed_roundtrip_preserves_rows_and_types(spark, tmp_path):
    """write_avro: one container file per partition, executor-encoded;
    read_avro: per-file tasks. Rows, NULLs, and timestamp_ntz micros all
    survive; the driver only ever sees the (file, rows) manifest."""
    df = (
        spark.range(0, 500)
        .select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.col("id").cast("double") / 8)
            .alias("v"),
            F.concat(F.lit("s"), F.col("id")).alias("s"),
            F.timestamp_micros(
                F.lit(1700000000000000) + F.col("id") * 1000003
            ).cast("timestamp_ntz").alias("ts"),
        )
        .repartition(5)
    )
    path = str(tmp_path / "dist")
    manifest = write_avro(df, path, codec="deflate")
    assert len(manifest) == 5
    assert sum(n for _, n in manifest) == 500
    assert len([f for f in os.listdir(path) if f.endswith(".avro")]) == 5
    back = read_avro(spark, path)
    assert dict(back.dtypes)["ts"] == "timestamp_ntz"
    want = sorted(tuple(r) for r in df.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == want


def test_read_any_dispatches_avro(spark, tmp_path):
    from redix_stream_spark.sources.ingest import read_any

    df = spark.range(0, 10).select(F.col("id").alias("k"))
    path = str(tmp_path / "ra")
    write_avro(df, path)
    assert read_any(spark, path, "avro").count() == 10
    with pytest.raises(ValueError, match="unsupported format"):
        read_any(spark, path, "feather")


def test_spark_schema_mapping_nested_logical_and_map_keys():
    """Logical types map at any nesting depth (round 12 — the former
    top-level-only gate is gone); non-string map keys still raise (an
    Avro spec constraint, not an engine gate)."""
    import pyspark.sql.types as T

    nested_ts = T.StructType(
        [T.StructField("a", T.ArrayType(T.TimestampType()), True)]
    )
    got = spark_schema_to_avro(nested_ts)
    items = got["fields"][0]["type"][1]["items"]  # containsNull → union
    assert items == ["null", {"type": "long", "logicalType": "timestamp-micros"}]
    non_str_map = T.StructType(
        [T.StructField("m", T.MapType(T.LongType(), T.LongType()), True)]
    )
    with pytest.raises(ValueError, match="string-keyed"):
        spark_schema_to_avro(non_str_map)


def test_date_type_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"d": [datetime.date(2024, 2, 29), datetime.date(1970, 1, 1), None]}
        )
    )
    path = str(tmp_path / "dates")
    write_avro(df, path)
    got = sorted(
        (r["d"] for r in read_avro(spark, path).collect()),
        key=lambda d: (d is None, d),
    )
    assert got == [datetime.date(1970, 1, 1), datetime.date(2024, 2, 29), None]


# --- round 11: nested types (arrays, maps, nested records) -------------------

NESTED_SCHEMA = {
    "type": "record",
    "name": "nrow",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "emb", "type": ["null", {"type": "array", "items": "float"}]},
        {"name": "tags", "type": {"type": "map", "values": ["null", "long"]}},
        {
            "name": "meta",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "nrow_meta",
                    "fields": [
                        {"name": "a", "type": ["null", "long"]},
                        {"name": "b", "type": "string"},
                    ],
                },
            ],
        },
    ],
}
NESTED_ROWS = [
    (1, [1.5, -2.25, 0.5], [("x", 3), ("y", None)], {"a": None, "b": "hi"}),
    (2, [], [], {"a": 7, "b": "z"}),
    (3, None, [("k", 1)], None),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_python_roundtrip_nested(codec):
    buf = io.BytesIO()
    write_avro_file(buf, NESTED_SCHEMA, NESTED_ROWS, codec=codec)
    got_schema, got = read_avro_file(buf.getvalue())
    assert got_schema == NESTED_SCHEMA
    assert got == NESTED_ROWS


def test_java_library_reads_our_nested_types(spark, tmp_path):
    """Spec compliance for the round-11 complex types, direction 1: the
    Java Avro library must decode our block-encoded arrays, string-keyed
    maps and nested records value-for-value."""
    path = str(tmp_path / "nested_ours.avro")
    with open(path, "wb") as fh:
        write_avro_file(fh, NESTED_SCHEMA, NESTED_ROWS, codec="deflate")
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        emb = rec.get("emb")
        emb_py = (
            None if emb is None else [float(emb.get(i)) for i in range(emb.size())]
        )
        tags = rec.get("tags")
        tags_py = sorted(
            (k.toString(), tags.get(k)) for k in tags.keySet()
        )
        meta = rec.get("meta")
        meta_py = (
            None
            if meta is None
            else {"a": meta.get("a"), "b": meta.get("b").toString()}
        )
        got.append((rec.get("id"), emb_py, tags_py, meta_py))
    reader.close()
    want = [(r[0], r[1], sorted(r[2]), r[3]) for r in NESTED_ROWS]
    assert got == want


def test_we_read_java_written_array_file(spark, tmp_path):
    """Spec compliance, direction 2: the Java library's block-encoded
    float arrays decode bit-exactly with the stdlib reader."""
    import json

    jvm = spark._jvm
    schema = {
        "type": "record",
        "name": "jarr",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "v", "type": {"type": "array", "items": "float"}},
        ],
    }
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    path = str(tmp_path / "theirs_arr.avro")
    writer.create(jschema, jvm.java.io.File(path))
    rows = [(1, [0.5, -1.25, 3.0]), (2, []), (3, [2.0**-20])]
    for k, vs in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        rec.put("k", jvm.java.lang.Long.valueOf(k))
        arr = jvm.java.util.ArrayList()
        for v in vs:
            arr.add(jvm.java.lang.Float.valueOf(v))
        rec.put("v", arr)
        writer.append(rec)
    writer.close()
    with open(path, "rb") as fh:
        _, got = read_avro_file(fh.read())
    assert got == rows


def test_embeddings_table_roundtrips_distributed(spark, sf_dir):
    """VERDICT r10 item 3's acceptance: the embeddings table (array<float>
    column) round-trips through fmt='avro' with identical schema and
    values."""
    from redix_stream_spark.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "avro_emb_roundtrip_test"
    )
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    write_avro(e.repartition(3), path, codec="deflate")
    back = read_avro(spark, path)
    assert back.schema == e.schema
    a = e.orderBy("vec_id").collect()
    b = back.orderBy("vec_id").collect()
    assert a == b
    shutil.rmtree(path, ignore_errors=True)


def test_map_struct_nested_roundtrip_distributed(spark, tmp_path):
    """Maps (incl. NULL values), nested records, and arrays-inside-
    records round-trip through the distributed path with identical
    Spark schema — the complex-type matrix beyond q205b's array face."""
    df = spark.createDataFrame(
        [
            (1, {"x": 3, "y": None}, (7, "hi", [1.5, None])),
            (2, {}, (None, "z", [])),
            (3, None, None),
        ],
        "id long, tags map<string,long>, "
        "meta struct<a:long,b:string,arr:array<double>>",
    )
    path = str(tmp_path / "nested_dist")
    write_avro(df.repartition(2), path, codec="deflate")
    back = read_avro(spark, path)
    assert back.schema == df.schema
    a = sorted(df.collect(), key=lambda r: r.id)
    b = sorted(back.collect(), key=lambda r: r.id)
    assert a == b


# --- round 12: logical types inside nested types (VERDICT r11 item 4) --------


def test_nested_logical_distributed_roundtrip(spark, tmp_path):
    """struct-of-timestamps, array<date>, and map<string,timestamp_ntz>
    round-trip through the distributed path with identical Spark schema
    and values — the former top-level-only logical gate is gone."""
    ts = datetime.datetime(2024, 2, 29, 12, 30, 45, 123456)
    d1, d2 = datetime.date(2024, 2, 29), datetime.date(1970, 1, 1)
    df = spark.createDataFrame(
        [
            (1, (ts, ts, d1), [d1, d2, None], {"a": ts, "b": None}),
            (2, (None, None, d2), [], {}),
            (3, None, None, None),
        ],
        "id long, meta struct<t:timestamp_ntz,t2:timestamp,d:date>, "
        "ds array<date>, m map<string,timestamp_ntz>",
    )
    path = str(tmp_path / "nested_logical")
    for codec in ("null", "deflate"):
        write_avro(df.repartition(2), path + codec, codec=codec)
        back = read_avro(spark, path + codec)
        assert back.schema == df.schema
        a = sorted(df.collect(), key=lambda r: r.id)
        b = sorted(back.collect(), key=lambda r: r.id)
        assert a == b, codec


def test_java_library_reads_our_nested_logical(spark, tmp_path):
    """Direction 1 for nested logicals: the Java library must read our
    struct-of-timestamp file and see the raw micros under the
    timestamp-micros logical items (GenericDatumReader reports the
    underlying longs)."""
    import json

    schema = {
        "type": "record",
        "name": "nl",
        "fields": [
            {"name": "k", "type": "long"},
            {
                "name": "ts_arr",
                "type": {
                    "type": "array",
                    "items": {"type": "long", "logicalType": "timestamp-micros"},
                },
            },
        ],
    }
    rows = [(1, [0, 1_700_000_000_000_000]), (2, [-86_400_000_000])]
    path = str(tmp_path / "ours_nested_logical.avro")
    with open(path, "wb") as fh:
        write_avro_file(fh, schema, rows)
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got_schema = json.loads(reader.getSchema().toString())
    assert got_schema["fields"][1]["type"]["items"]["logicalType"] == (
        "timestamp-micros"
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        arr = rec.get("ts_arr")
        got.append((rec.get("k"), [arr.get(i) for i in range(arr.size())]))
    reader.close()
    assert got == rows


def test_we_read_java_written_nested_logical(spark, tmp_path):
    """Direction 2: a Java-written record-of-timestamp file decodes to
    the same micros, and the distributed reader lifts them to Spark
    TIMESTAMP values."""
    import json

    schema = {
        "type": "record",
        "name": "jnl",
        "fields": [
            {"name": "k", "type": "long"},
            {
                "name": "meta",
                "type": {
                    "type": "record",
                    "name": "jnl_meta",
                    "fields": [
                        {
                            "name": "t",
                            "type": {
                                "type": "long",
                                "logicalType": "local-timestamp-micros",
                            },
                        },
                        {
                            "name": "d",
                            "type": {"type": "int", "logicalType": "date"},
                        },
                    ],
                },
            },
        ],
    }
    jvm = spark._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    )
    path = str(tmp_path / "theirs_nested_logical.avro")
    writer.create(jschema, jvm.java.io.File(path))
    msch = jschema.getField("meta").schema()
    rows = [(1, 1_700_000_000_000_000, 19_782), (2, -1, 0)]
    for k, micros, days in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        rec.put("k", jvm.java.lang.Long.valueOf(k))
        meta = jvm.org.apache.avro.generic.GenericData.Record(msch)
        meta.put("t", jvm.java.lang.Long.valueOf(micros))
        meta.put("d", jvm.java.lang.Integer.valueOf(days))
        rec.put("meta", meta)
        writer.append(rec)
    writer.close()
    with open(path, "rb") as fh:
        _, got = read_avro_file(fh.read())
    assert got == [(k, {"t": t, "d": d}) for k, t, d in rows]
    # the distributed reader lifts to Spark datetime values
    back = {
        r["k"]: r["meta"]
        for r in read_avro(spark, str(tmp_path)).collect()
    }
    assert back[1]["t"] == datetime.datetime(1970, 1, 1) + datetime.timedelta(
        microseconds=1_700_000_000_000_000
    )
    assert back[1]["d"] == datetime.date(1970, 1, 1) + datetime.timedelta(
        days=19_782
    )
    assert back[2]["t"] == datetime.datetime(1969, 12, 31, 23, 59, 59, 999999)
    assert back[2]["d"] == datetime.date(1970, 1, 1)
