"""Object-store lake access via s3a (SURVEY.md §2A S4/S5).

The reference talks to MinIO with the ``minio`` Python SDK and pulls whole
objects onto the driver heap (``minio_api/minio_utils.py:4-19``).  The
engine replaces the entire data path with Hadoop-s3a reads/writes —
executor-side, splittable, no driver materialization.  Bucket management
is control-plane and intentionally out of scope of the query engine.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def configure_s3a(
    spark: SparkSession,
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
    ssl: bool = False,
) -> None:
    """Point ``s3a://`` at a MinIO-compatible endpoint.

    After this, ``spark.read.csv("s3a://bucket/key")`` /
    ``df.write.parquet("s3a://bucket/prefix")`` replace the reference's
    SDK get/put (S4/S5).  Credentials come from the caller (the reference
    reads them from ``minio.env``)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", endpoint)
    hconf.set("fs.s3a.access.key", access_key)
    hconf.set("fs.s3a.secret.key", secret_key)
    hconf.set("fs.s3a.path.style.access", str(path_style).lower())
    hconf.set("fs.s3a.connection.ssl.enabled", str(ssl).lower())
