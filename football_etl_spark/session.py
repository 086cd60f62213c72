"""SparkSession factory with engine defaults.

The engine pins the handful of configs that its semantics rely on
(SURVEY.md §7.4):

- ``spark.sql.ansi.enabled=false`` — the reference's pandas
  ``to_numeric(errors='coerce')`` / permissive date parsing semantics
  (null-on-failure) require non-ANSI casts; the expression library
  additionally uses ``try_*`` forms so it stays correct either way.
- ``spark.sql.session.timeZone=UTC`` — oracle comparison against
  DuckDB's UTC-naive timestamps.
- AQE on — runtime partition coalescing + skew-join handling is the
  scale story for skewed keys (big leagues / hot customers).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Worker threads for local mode (driver-set via SPARK_GRAFT_CPUS)."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Distribute the engine's package source to executor Python
    workers — the in-process twin of ``spark-submit --py-files``.

    Code that pickles BY REFERENCE (Python DataSource classes,
    module-level helpers) needs ``football_etl_spark`` importable on
    the worker side; when the driver found the repo via ``sys.path``
    alone (foreign cwd, no PYTHONPATH export — exactly how the
    correctness driver invokes the contract module), workers cannot.
    Zipping the package once per process and ``addPyFile``-ing it puts
    the archive on every worker's ``sys.path`` before task
    deserialization. Cached per applicationId; repeat calls are
    no-ops. On a real cluster the same archive rides
    ``--py-files``/``spark.submit.pyFiles`` and this helper is a
    harmless re-add."""
    import tempfile
    import zipfile

    app = spark.sparkContext.applicationId
    if app in _SHIPPED:
        return
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_root)
    zp = os.path.join(tempfile.gettempdir(), f"fes_pkg_{os.getpid()}.zip")
    # Always (re)build: an archive left by a recycled pid or an older
    # checkout must never ship stale code to executors. The build is
    # ~60 small files; os.replace keeps the publish atomic.
    tmp = f"{zp}.{app}.tmp"
    with zipfile.ZipFile(tmp, "w") as z:
        for root, _, files in os.walk(pkg_root):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, parent))
    os.replace(tmp, zp)
    spark.sparkContext.addPyFile(zp)
    _SHIPPED.add(app)


def get_spark(
    app_name: str = "football-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``shuffle_partitions`` defaults to the local core count — the right
    size for local mode; on a real cluster the engine relies on AQE
    coalescing from a larger initial number, so callers pass it
    explicitly there.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
