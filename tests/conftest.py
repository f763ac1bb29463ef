from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# default sf0.001 for speed; SPARK_GRAFT_TEST_SF=sf0.01 (or sf0.1) runs the
# whole parity suite at a larger scale — worth one sweep per round since key
# collisions and value distributions change with sf
SF_SMALL = f"/root/testdata/{os.environ.get('SPARK_GRAFT_TEST_SF', 'sf0.001')}"


@pytest.fixture(scope="session")
def spark():
    from hadoopmapreduce_spark.session import get_spark

    spark = get_spark("hadoopmapreduce-spark-tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    from hadoopmapreduce_spark.oracle import duckdb_connect

    con = duckdb_connect(sf_dir)
    yield con
    con.close()
