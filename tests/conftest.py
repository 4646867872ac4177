"""Shared fixtures: one SparkSession, one tiny corpus, one built index.

Corpus scale follows FIXTURES.md: `tiny` = 1,000 pages for unit/e2e pytest.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from hadoopsearchengine_spark.session import get_spark
from hadoopsearchengine_spark.sources.pages import synth_pages_local, write_pages
from oracle.index import OracleIndex

N_TINY = 1000
SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def workdir():
    d = tempfile.mkdtemp(prefix="sfe_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def pages_local():
    return synth_pages_local(N_TINY, SEED)


@pytest.fixture(scope="session")
def oracle_index(pages_local):
    return OracleIndex(pages_local)


@pytest.fixture(scope="session")
def pages_path(spark, workdir):
    path = f"{workdir}/pages"
    write_pages(spark, N_TINY, path, SEED)
    return path


@pytest.fixture(scope="session")
def index_dir(spark, workdir, pages_path):
    from hadoopsearchengine_spark.plans.build_index import build_index
    out = f"{workdir}/index"
    # small knobs so head-term salting + multi-block terms are exercised
    build_index(spark, pages_path, out, block_docs=64,
                head_df_threshold=200, n_range_buckets=4)
    return out
