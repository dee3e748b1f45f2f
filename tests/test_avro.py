"""Tests for the pure-Python Avro codec + the avro_py Spark DataSource.

The Java cross-validation tests drive the REFERENCE Apache Avro
implementation (avro-*.jar ships inside pyspark's jars) through a
tiny javac-compiled harness — both directions: Java reads our files,
we read Java's. They skip cleanly when javac is absent.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pytest

from journal_batch_processer_spark.sources.avro import (
    container_schema,
    read_container,
    write_container,
)

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
    ],
}


def _recs(n):
    return [
        {
            "k": i,
            "s": None if i % 5 == 0 else f"v{i}",
            "d": i * 0.5,
            "b": i % 2 == 0,
            "raw": bytes([i % 256, (i * 3) % 256]),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    recs = _recs(2500)  # > block_records: multiple blocks
    n = write_container(p, SCHEMA, iter(recs), codec=codec)
    assert n == 2500
    assert list(read_container(p)) == recs
    assert container_schema(p) == SCHEMA


def test_empty_container(tmp_path):
    p = str(tmp_path / "empty.avro")
    assert write_container(p, SCHEMA, iter([])) == 0
    assert list(read_container(p)) == []


def test_malformed_fails_loud(tmp_path):
    p = str(tmp_path / "x.avro")
    write_container(p, SCHEMA, iter(_recs(10)))
    raw = open(p, "rb").read()
    with pytest.raises(ValueError, match="magic"):
        list(read_container_from(tmp_path, b"NOPE" + raw[4:]))
    # corrupt the trailing sync marker
    with pytest.raises(ValueError, match="sync"):
        list(read_container_from(tmp_path, raw[:-16] + b"\xff" * 16))


def read_container_from(tmp_path, data: bytes):
    p = str(tmp_path / "corrupt.avro")
    with open(p, "wb") as f:
        f.write(data)
    return read_container(p)


# ------------------------------------------------ Java cross-validation


def _jars():
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


_JAVA = None


def _java_harness():
    """Compile AvroDump/AvroWrite against the in-distribution Avro jar."""
    global _JAVA
    if _JAVA is not None:
        return _JAVA or None
    _JAVA = False
    if not shutil.which("javac") or not shutil.which("java"):
        return None
    d = os.path.join(tempfile.gettempdir(), "jbp_avrocheck")
    os.makedirs(d, exist_ok=True)
    dump = os.path.join(d, "AvroDump.java")
    with open(dump, "w") as f:
        f.write(
            """
import org.apache.avro.file.DataFileReader;
import org.apache.avro.generic.GenericDatumReader;
import org.apache.avro.generic.GenericRecord;
import java.io.File;
public class AvroDump {
  public static void main(String[] args) throws Exception {
    DataFileReader<GenericRecord> r = new DataFileReader<>(
        new File(args[0]), new GenericDatumReader<GenericRecord>());
    while (r.hasNext()) System.out.println(r.next());
    r.close();
  }
}
"""
        )
    wr = os.path.join(d, "AvroWrite.java")
    with open(wr, "w") as f:
        f.write(
            """
import org.apache.avro.Schema;
import org.apache.avro.file.CodecFactory;
import org.apache.avro.file.DataFileWriter;
import org.apache.avro.generic.GenericData;
import org.apache.avro.generic.GenericDatumWriter;
import org.apache.avro.generic.GenericRecord;
import java.io.File;
public class AvroWrite {
  public static void main(String[] args) throws Exception {
    Schema s = new Schema.Parser().parse(
      "{\\"type\\":\\"record\\",\\"name\\":\\"row\\",\\"fields\\":[" +
      "{\\"name\\":\\"k\\",\\"type\\":\\"long\\"}," +
      "{\\"name\\":\\"s\\",\\"type\\":[\\"null\\",\\"string\\"]}," +
      "{\\"name\\":\\"d\\",\\"type\\":\\"double\\"}]}");
    DataFileWriter<GenericRecord> w = new DataFileWriter<>(
        new GenericDatumWriter<GenericRecord>(s));
    w.setCodec("deflate".equals(args[1]) ? CodecFactory.deflateCodec(6)
                                         : CodecFactory.nullCodec());
    w.create(s, new File(args[0]));
    for (long i = 0; i < 1777; i++) {
      GenericRecord r = new GenericData.Record(s);
      r.put("k", i);
      r.put("s", i % 7 == 0 ? null : ("j" + i));
      r.put("d", i * 0.25);
      w.append(r);
    }
    w.close();
  }
}
"""
        )
    r = subprocess.run(
        ["javac", "-cp", f"{_jars()}/*", "-d", d, dump, wr],
        capture_output=True,
    )
    if r.returncode != 0:
        return None
    _JAVA = d
    return d


def _need_java():
    d = _java_harness()
    if not d:
        pytest.skip("javac/java or Avro jar unavailable")
    return d


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_java_reads_our_container(tmp_path, codec):
    d = _need_java()
    p = str(tmp_path / "ours.avro")
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
        ],
    }
    recs = [
        {"k": i, "s": None if i % 3 == 0 else f"x{i}", "d": i * 1.5}
        for i in range(500)
    ]
    write_container(p, schema, iter(recs), codec=codec)
    out = subprocess.run(
        ["java", "-cp", f"{d}:{_jars()}/*", "AvroDump", p],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stderr
    lines = out.stdout.splitlines()
    assert len(lines) == 500
    assert lines[0] == '{"k": 0, "s": null, "d": 0.0}'
    assert lines[1] == '{"k": 1, "s": "x1", "d": 1.5}'


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_we_read_java_container(tmp_path, codec):
    d = _need_java()
    p = str(tmp_path / "java.avro")
    r = subprocess.run(
        ["java", "-cp", f"{d}:{_jars()}/*", "AvroWrite", p, codec],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    recs = list(read_container(p))
    want = [
        {"k": i, "s": None if i % 7 == 0 else f"j{i}", "d": i * 0.25}
        for i in range(1777)
    ]
    assert recs == want


# ------------------------------------------------ Spark DataSource


def test_avro_py_datasource_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from journal_batch_processer_spark.queries.ref_io import _register_avro
    from journal_batch_processer_spark.sources.avro import write_container

    _register_avro(spark)
    d = str(tmp_path / "scan")
    os.makedirs(d)
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    write_container(
        os.path.join(d, "part-0.avro"), schema,
        ({"k": i, "s": f"a{i}"} for i in range(100)),
    )
    write_container(
        os.path.join(d, "part-1.avro"), schema,
        ({"k": i, "s": None if i % 3 else f"b{i}"} for i in range(100, 250)),
    )
    df = spark.read.format("avro_py").load(d)
    assert df.schema.simpleString() == "struct<k:bigint,s:string>"
    assert df.count() == 250
    assert df.filter("s is null").count() == 100
    out = str(tmp_path / "sink")
    df.selectExpr("k", "k * 2 as k2").write.format("avro_py").mode(
        "append"
    ).option("path", out).save()
    back = spark.read.format("avro_py").load(out)
    assert back.count() == 250
    assert back.agg(F.sum("k2")).collect()[0][0] == 2 * sum(range(250))
