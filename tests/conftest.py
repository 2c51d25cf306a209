from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from distributed_webcrawler_spark import get_spark

    s = get_spark(cpus=4, shuffle_partitions=8, app_name="dws-tests",
                  extra_conf={"spark.driver.memory": "8g"})
    yield s


@pytest.fixture(scope="session")
def fixture_dir(spark):
    """Small deterministic web fixture shared across tests."""
    from distributed_webcrawler_spark.sources import datagen

    tmp = tempfile.mkdtemp(prefix="dws-fixture-")
    datagen.write_fixture(spark, tmp, n_urls=240, n_hosts=8, n_images=40,
                          n_seeds=3, max_out_degree=10)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture()
def warehouse():
    tmp = tempfile.mkdtemp(prefix="dws-wh-")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)
