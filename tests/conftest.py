from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_data_peri_institute_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture()
def tmp_store(spark, tmp_path):
    from etl_data_peri_institute_spark.sinks import ParquetStore

    return ParquetStore(spark, str(tmp_path / "store"))


SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
