"""SparkSession factory tuned for this engine.

Defaults are sized for the test harness (local[32], 128 GiB single JVM)
but every knob is the one you would also set on a 1000-executor cluster:
AQE for runtime re-planning + skew-join handling, auto broadcast for
dimension joins, Arrow for the (rare) pandas-UDF paths, UTC session time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# InferFiltersFromGenerate turns every explode(f(x)) into
# `size(f(x)) > 0 AND isnotnull(f(x))`, and predicate pushdown then
# drags that inferred filter below exchanges to the scan — so the whole
# generator expression (shingle transforms, pivot builders: our most
# expensive map-side work) is evaluated TWICE, once of those in the
# scan stage whose parallelism is the file split count (1, for
# single-row-group files). The inference only ever saves work when most
# input arrays are empty, which never holds for shingles/chunks/pivots;
# the double evaluation is a pure loss, so the rule is excluded at the
# session level (same class of fix as SPARK-36715's cost guard).
EXCLUDED_OPTIMIZER_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def get_spark(app_name: str = "advanced-strapi-import-spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Scale notes: on a real cluster, leave ``shuffle_partitions`` to AQE
    coalescing (initialPartitionNum high, AQE shrinks); locally we pin it
    to the core count so tests don't pay 200-partition scheduling tax.

    ``extra_conf`` lets a harness layer context-start-only knobs on top
    (no in-repo caller passes it today — bench.py's periodicGC=1min
    experiment used it and was reverted as a measured net loss); it has
    no effect when an existing session is fetched.
    """
    n = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python UDTFs (token_explode) evaluate via Arrow batches, not
        # pickled row-at-a-time
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local[32] puts all 32 executor threads inside the driver JVM:
        # 8g forced full-GC pauses mid-suite (2-3x per-query timing
        # variance); 24g on the 128 GiB harness box keeps GC off the
        # critical path. On a real cluster this knob is per-executor
        # memory instead (see cluster_conf).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # the generated-class cache defaults to 100 entries; a 96-query
        # suite compiles ~500 codegen stages, so with the default every
        # query's compiled classes are evicted between runs and each
        # re-execution pays full Janino recompile (seconds for wide
        # plans). One class is small; keep them all.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.optimizer.excludedRules", EXCLUDED_OPTIMIZER_RULES)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def cluster_conf(executors: int = 1000, cores_per_executor: int = 4) -> dict[str, str]:
    """The conf this engine expects on a real cluster (documentation as
    code; local runs use get_spark's smaller variants). Rationale per
    key in SCALE.md."""
    total_cores = executors * cores_per_executor
    return {
        # AQE owns runtime parallelism: start high, let it coalesce
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": str(total_cores * 3),
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
        "spark.sql.shuffle.partitions": str(total_cores * 2),
        # scans: 128-256m splits keep task count ~ O(input/128m)
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.parquet.filterPushdown": "true",
        # dims up to 256m broadcast (executors are multi-GB at this scale)
        "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024 * 1024),
        # arrow paths (multimodal/zip stages): payload-sized batches
        "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
        "spark.sql.session.timeZone": "UTC",
        # shuffle robustness at 1000 executors
        "spark.shuffle.service.enabled": "true",
        "spark.stage.maxConsecutiveAttempts": "8",
    }


# sessions already tuned, by applicationId: the driver contract binds
# tune() into EVERY query invocation (__spark_entry__.queries), so a
# 327-query run would otherwise pay 8 py4j conf.set round trips per
# query for values that were set on the first call and that nothing in
# the engine changes without restoring (r12 VERDICT task 2 — per-query
# constant cost). A new session (new applicationId) re-tunes.
_TUNED: set[str] = set()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable knobs to an externally provided session
    (the driver hands us its own SparkSession in ``entry``); no-op on
    a session this process already tuned."""
    app = spark.sparkContext.applicationId
    if app in _TUNED:
        return spark
    for k, v in [
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        # a vanilla session's 200 shuffle partitions cost pure
        # scheduling overhead at correctness-check scale; AQE still
        # owns runtime parallelism above this floor
        ("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS)),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.execution.pythonUDTF.arrow.enabled", "true"),
        ("spark.sql.optimizer.excludedRules", EXCLUDED_OPTIMIZER_RULES),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf may be fixed at session start; all are safe to skip
    if len(_TUNED) >= 64:
        _TUNED.clear()
    _TUNED.add(app)
    return spark
