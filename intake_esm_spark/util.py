"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import SparkSession


def write_text_sidecar(spark: SparkSession, path: str, payload: str) -> None:
    """Driver-side write of a small metadata sidecar file through the
    Hadoop FileSystem API. One metadata file needs no Spark job (a
    one-row DataFrame write still pays full job-commit machinery), and
    the FS API keeps it portable to every Hadoop-supported filesystem
    (s3a/hdfs/file) where a real index lives. Written under an
    underscore-prefixed directory so Spark's file index ignores it;
    readable back with ``spark.read.text(path)`` as long as the payload
    is a single line."""
    jvm = spark._jvm
    fs_path = jvm.org.apache.hadoop.fs.Path(f"{path}/part-00000")
    fs = fs_path.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(fs_path, True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()
