"""Scheme-aware small-file IO via the JVM Hadoop FileSystem API.

Sidecar/state files written next to Spark parquet output must land
wherever the parquet's path scheme says (local disk, hdfs://, s3a://)
— a local ``open()``/``os.path`` beside a Spark writer silently lands
on (or reads from) a bogus local path when the dataset root is remote,
which is the documented 100 TB posture (r9 ADVICE; the BM25 stats
sidecar was the first fix, the streaming sketch/upsert state checks
the second).
"""

from __future__ import annotations


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path) for ``path`` — scheme-aware."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return hpath.getFileSystem(conf), hpath


def fs_write_text(spark, path: str, text: str) -> None:
    """Write a small text file through the Hadoop FS API."""
    fs, hpath = _hadoop_fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def fs_read_text(spark, path: str) -> str:
    """Read a small text file through the Hadoop FS API."""
    fs, hpath = _hadoop_fs(spark, path)
    stream = fs.open(hpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def fs_exists(spark, path: str) -> bool:
    """Scheme-aware existence check (``os.path.exists`` is local-FS
    only — on an hdfs:// or s3a:// dataset root it silently returns
    False and callers 'discover' empty state every time)."""
    fs, hpath = _hadoop_fs(spark, path)
    return bool(fs.exists(hpath))


def fs_delete(spark, path: str) -> None:
    """Scheme-aware recursive delete (``shutil.rmtree`` twin);
    missing paths are a no-op."""
    fs, hpath = _hadoop_fs(spark, path)
    fs.delete(hpath, True)
