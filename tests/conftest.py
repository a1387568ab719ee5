from __future__ import annotations

import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from skope_api_spark.session import get_spark

    # warehouse dir is a static conf — point it at a tmpdir at session build
    # so bucketed-table tests don't write into the repo
    wh = tempfile.mkdtemp(prefix="spark_wh_")
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()
