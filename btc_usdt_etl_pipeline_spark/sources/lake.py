"""Object-store lake access via s3a (SURVEY.md §2A S4/S5).

The reference talks to MinIO with the ``minio`` Python SDK and pulls whole
objects onto the driver heap (``minio_api/minio_utils.py:4-19``).  The
engine replaces the entire data path with Hadoop-s3a reads/writes —
executor-side, splittable, no driver materialization.  Bucket management
is control-plane and intentionally out of scope of the query engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame,
    path: str,
    time_col: str = "ts",
    sort_cols: Sequence[str] = (),
    files_per_partition: int = 1,
    salt_col: str | None = None,
) -> None:
    """Time-series lake layout: hive-partition by day, cluster within.

    The layout IS the index at 100 TB:

    - ``dt=YYYY-MM-DD/`` directories give the reader free partition
      pruning — a one-day query plans a one-day scan, no file listing
      of the other 36,499 days' data.
    - ``repartition(day[, hash(salt) % k])`` bounds files per
      partition (the classic dynamic-partition failure mode is
      reducers × days tiny files; one shuffle fixes it), with an
      optional salt to split a hot day across ``files_per_partition``
      writers; ``sortWithinPartitions`` clusters rows (e.g. by user,
      time) so parquet row-group min/max stats prune WITHIN files too.
    - Dynamic partition overwrite makes a day's backfill idempotent:
      rerunning replaces exactly that day, never duplicates (same
      contract as warehouse.save_as_table).  It is requested as a
      per-WRITE option (which takes precedence over the session conf),
      so the caller's session-wide overwrite mode is never mutated —
      a leaked "dynamic" would silently change the semantics of every
      subsequent unrelated ``mode("overwrite")`` write in the session.
    """
    out = df.withColumn(
        "dt", F.date_format(F.col(time_col), "yyyy-MM-dd")
    )
    parts = [F.col("dt")]
    if files_per_partition > 1 and salt_col is not None:
        parts.append(
            F.pmod(F.xxhash64(F.col(salt_col)), F.lit(files_per_partition))
        )
    out = out.repartition(*parts)
    if sort_cols:
        out = out.sortWithinPartitions("dt", *sort_cols)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("dt")
        .parquet(path)
    )


def s3a_available(spark: SparkSession) -> bool:
    """Whether the s3a connector classes are actually on the JVM
    classpath.  The plain ``pip install pyspark`` distribution ships
    WITHOUT ``hadoop-aws`` (verified against this environment's 287
    bundled jars — zero aws artifacts), so a config-only setup "works"
    until the first read throws ``ClassNotFoundException`` deep inside
    a job.  Callers probe this up front and fail with an actionable
    message instead."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:  # noqa: BLE001  (py4j wraps ClassNotFound)
        return False


def configure_s3a(
    spark: SparkSession,
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
    ssl: bool = False,
    require_classpath: bool = False,
) -> None:
    """Point ``s3a://`` at a MinIO-compatible endpoint.

    After this, ``spark.read.csv("s3a://bucket/key")`` /
    ``df.write.parquet("s3a://bucket/prefix")`` replace the reference's
    SDK get/put (S4/S5).  Credentials come from the caller (the reference
    reads them from ``minio.env``).  ``require_classpath=True`` fails
    fast (with the exact ``--packages`` fix) when the ``hadoop-aws``
    connector is not on the classpath — see :func:`s3a_available`."""
    if require_classpath and not s3a_available(spark):
        raise RuntimeError(
            "s3a connector not on the JVM classpath: this PySpark "
            "distribution does not bundle hadoop-aws.  Launch with "
            "spark.jars.packages="
            "org.apache.hadoop:hadoop-aws:<hadoop-version> "
            "(matching the bundled Hadoop), then retry."
        )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", endpoint)
    hconf.set("fs.s3a.access.key", access_key)
    hconf.set("fs.s3a.secret.key", secret_key)
    hconf.set("fs.s3a.path.style.access", str(path_style).lower())
    hconf.set("fs.s3a.connection.ssl.enabled", str(ssl).lower())
    # Pin the provider chain to the static keys just set: without this,
    # s3a walks the full default chain (env vars, instance profile, …)
    # on every filesystem init — slow against MinIO and a source of
    # confusing partial-credential errors when the host has ambient AWS
    # config lying around.
    hconf.set(
        "fs.s3a.aws.credentials.provider",
        "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider",
    )


def z_value(
    cols: Sequence,
    ranges: Sequence[tuple[float, float]],
    bits: int = 16,
):
    """Morton (Z-order) interleave of N columns → one clustering key.

    ``sortWithinPartitions(z_value(...))`` clusters rows so parquet
    row-group min/max stats stay narrow on EVERY participating column
    simultaneously — single-column sort clusters perfectly on one
    column and not at all on the others; Z-order trades a little of
    each for pruning on all (the standard lakehouse multi-dimension
    clustering move).

    ``ranges``: (lo, hi) per column — explicit metadata, NOT probed
    (an eager min/max scan at plan time is the anti-pattern this
    module avoids; callers know their domains).  Values are scaled to
    ``bits``-bit integer ranks, clamped at the edges, then
    bit-interleaved with pure integer expressions (whole-stage
    codegen; ``N * bits`` shift/mask terms).
    """
    if len(cols) != len(ranges):
        raise ValueError("cols and ranges must align")
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError("interleaved width must fit a signed long")
    n = len(cols)
    scale = (1 << bits) - 1
    ranks = []
    for c, (lo, hi) in zip(cols, ranges):
        c = F.col(c) if isinstance(c, str) else c
        if hi <= lo:
            raise ValueError("range hi must exceed lo")
        r = F.floor(
            (c.cast("double") - F.lit(float(lo)))
            / F.lit(float(hi) - float(lo))
            * F.lit(scale)
        ).cast("long")
        ranks.append(F.greatest(F.lit(0), F.least(F.lit(scale), r)))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z
