import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    # local[8], not local[*]: the suite's frames are tiny (tens to a few
    # thousand rows), so at 32 cores every parallelize/shuffle stage pays
    # 32 near-empty tasks of pure scheduling — the r13 driver pytest run
    # exceeded its verify window (VERDICT r13 item 3). 8 cores keeps
    # multi-core semantics (AQE, concurrent family jobs, worker reuse)
    # while quartering the per-action task floor.
    s = (
        SparkSession.builder.master("local[8]")
        .appName("feature_factory_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.warehouse.dir", "/tmp/ff_spark_warehouse")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()
