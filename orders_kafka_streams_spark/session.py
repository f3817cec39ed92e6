"""SparkSession factory + runtime tuning.

Two entry points:

- :func:`get_spark` builds a session for tests / bench (local mode).
- :func:`tune` applies the runtime-settable confs we rely on to an
  *existing* session (the correctness driver owns its own session; we
  must not assume its build-time config).

Scale stance (100 TB): everything here is runtime-settable and safe on
a real cluster — AQE for runtime re-planning + skew joins, partition
coalescing, and a UTC session timezone so results are engine-portable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to any session before running a query.
_RUNTIME_CONF = {
    # Engine-portable timestamps (DuckDB/parquet are UTC-naive).
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime shuffle-partition coalescing, skew-join splitting,
    # dynamic join-strategy switching. Essential at 100 TB, harmless at sf0.01.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas exchange (collect, pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def env_int(name: str, default: int, lo: int, hi: int) -> int:
    """Validated integer env override (r12, ADVICE r11): execution
    knobs like OKSS_SEMDEDUP_CAP / OKSS_COOC_HEAVY_BASKET were bare
    ``int()`` parses — garbage crashed at import with a bare
    ValueError, and out-of-range values (cap ≤ 0, a quadratically
    huge fan-out bound) silently broke decomposition invariants.
    Fails at import with a message naming the variable and its sane
    range. NOTE: tests/plan_budgets.json pins exchange counts under
    the DEFAULTS — overriding a knob desyncs the committed plan
    facts; that is a test-environment statement, not a correctness
    one (the decompositions are exact at any in-range value)."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        v = int(raw)
    except ValueError as e:
        raise ValueError(f"{name}={raw!r} is not an integer") from e
    if not (lo <= v <= hi):
        raise ValueError(f"{name}={v} outside sane range [{lo}, {hi}]")
    return v


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable in Python workers.

    The correctness driver may run queries from a cwd where this repo
    is not on PYTHONPATH; workers (separate processes) then cannot
    unpickle any UDF that references package code. Shipping a zip via
    ``addPyFile`` fixes that session-wide — the same mechanism used to
    deploy the package to a real cluster's executors.
    """
    marker = "_okss_pkg_shipped"
    sc = spark.sparkContext
    if getattr(sc, marker, False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "okss_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    setattr(sc, marker, True)


def tune(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime confs to an existing session (driver- or test-owned)."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some builds
            pass
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        try:
            # a driver-owned session may come in with Spark's 200 default —
            # wrong in both directions locally; right-size to the host once,
            # without clobbering a deliberately configured value.
            if spark.conf.get("spark.sql.shuffle.partitions") == "200":
                spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
        except Exception:  # pragma: no cover
            pass
    try:
        _ship_package(spark)
    except Exception:  # pragma: no cover - best-effort; kernels are self-contained
        pass
    return spark


def get_spark(
    app_name: str = "orders_kafka_streams_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local session sized for this host.

    On a real cluster the same query code runs unchanged — only the
    master URL and executor sizing differ; nothing in the operators
    assumes local mode.
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # 24g default (r11): in local mode the driver heap IS the
        # executor heap, and at 8g the scale tiers' ~20 persisted
        # relations squeezed execution memory enough to inflate the
        # Arrow-kernel queries ~40% in-tier (controlled quiet A/B:
        # q_semdedup sf1skew min-of-2 3.53 s at 8g vs 2.49 s at 24g,
        # identical code/corpus) — storage churn masquerading as the
        # queries' "load response". The host profile is 32 cores /
        # 128 GiB; 24g leaves ample headroom and the env override
        # stands for smaller hosts.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/okss-warehouse")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark, shuffle_partitions)
