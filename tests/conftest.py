import pytest

from cpp_parquet_spark.session import apply_malloc_env

apply_malloc_env()


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    import os

    scratch = "/dev/shm/spark-test-scratch" if os.path.isdir("/dev/shm") else None
    builder = SparkSession.builder
    if scratch:
        # the root fs is ext4-on-virtio with `discard`: shuffle-file
        # churn triggers host TRIM storms (see BASELINE.md) — tmpfs
        # scratch keeps test timing sane
        os.makedirs(scratch, exist_ok=True)
        builder = builder.config("spark.local.dir", scratch)
    s = (
        builder.master("local[4]")
        .appName("cpp-parquet-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med():
    return SF_MED
