"""SparkSession construction tuned for both local testing and cluster scale.

Local tests run on ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``),
but every setting here is chosen to also be the right default on a
1000-executor cluster reading 100 TB:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  dynamic broadcast conversion).
- Arrow on for any Python<->JVM exchange (Pandas UDFs, toPandas).
- Session timezone pinned to UTC so timestamp semantics are stable and
  match the DuckDB oracle (naive timestamps).
- ``spark.sql.shuffle.partitions`` is a *starting* value; AQE coalesces
  down post-shuffle. On a real cluster this would be sized ~2-3x total
  cores; locally 32 matches the driver's local[32].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "csv-to-parquet-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    # Executor Python workers must import this package too (pandas
    # UDFs pickle references to csv_to_parquet_spark.*). The driver
    # finds it via sys.path, but workers only see the worker env —
    # running bench.py/__spark_entry__ from OUTSIDE the repo root
    # crashed every Arrow-UDF stage with ModuleNotFoundError (caught
    # by the r11 /verify pass). Scoped to the workers via
    # spark.executorEnv.PYTHONPATH (SparkContext merges executorEnv.*
    # into every Python worker's environment, local mode included)
    # instead of mutating the process-global os.environ, which leaked
    # the repo root into EVERY subprocess the caller spawned
    # afterwards (ADVICE r11). Confs are a no-op when getOrCreate
    # reuses an existing session, and driver sys.path does NOT feed
    # workers — so after getOrCreate we also patch the live
    # SparkContext.environment (UDF envVars snapshot it at function
    # creation, the pbcompat mechanism), covering sessions created
    # outside get_spark. On a real cluster the equivalent is shipping
    # the package via --py-files / a wheel.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inherited = os.environ.get("PYTHONPATH", "")
    if pkg_root not in inherited.split(os.pathsep):
        worker_pythonpath = (
            pkg_root + (os.pathsep + inherited if inherited else "")
        )
    else:
        worker_pythonpath = inherited

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # 128 MB scan splits — matches the reference's 128 MB row groups
        # (converter/converter.go:325) and Spark's default; restated so a
        # cluster deploy doesn't silently inherit something else.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may have attached to a pre-existing session whose
    # worker env lacks the repo root (confs are ignored on reuse);
    # sc.environment is snapshotted into every subsequently-created
    # UDF's envVars, so patching it here covers that path too.
    env = spark.sparkContext.environment
    existing_pp = env.get("PYTHONPATH", "")
    if pkg_root not in (existing_pp or "").split(os.pathsep):
        env["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing_pp if existing_pp else "")
        )
    return spark
