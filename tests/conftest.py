from __future__ import annotations

import os

import pytest

from kettle_jena_plugins_spark.session import get_spark, iceberg_confs


@pytest.fixture(scope="session")
def spark():
    # KJP_ICEBERG_WAREHOUSE=<dir> + an iceberg-spark-runtime jar on the
    # classpath turn the skip-guarded Iceberg integration test live
    # (README "Running the live Iceberg sink"); without the jar the confs
    # are inert and the test keeps skipping.
    extra = None
    wh = os.environ.get("KJP_ICEBERG_WAREHOUSE")
    if wh:
        extra = iceberg_confs(wh)
    s = get_spark(
        app_name="kjp-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf=extra,
    )
    yield s
    s.stop()
