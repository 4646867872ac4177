"""Driver-contract gate, run locally: every queries() entry with an
oracle_sql() must match DuckDB exactly (row count, schema, values) at
sf0.001; rows-only entries must at least produce rows. Mirrors what the
driver records in CORRECTNESS_r{N}.json."""

import pytest

import __spark_entry__ as E
from tests.entry_compare import run

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(spark):
    return run(SF, spark=spark)


def test_entry_smoke(spark):
    rows = E.entry(spark).collect()
    assert len(rows) > 0
    cols = set(rows[0].asDict())
    assert cols == {"doc_id", "score"}


def test_every_query_has_impl_and_most_have_oracles():
    qs, osql = E.queries(), E.oracle_sql()
    assert len(qs) >= 30
    assert set(osql) <= set(qs)
    # at least 80% of ops are strongly verified (SQL oracle)
    assert len(osql) / len(qs) >= 0.8


def test_all_queries_match_oracle(results):
    bad = {n: p for n, p in results.items()
           if p and not p[0].startswith("(rows-only)")}
    assert not bad, bad


def test_rows_only_entries_nonempty(results):
    for name, p in results.items():
        if p and p[0].startswith("(rows-only)"):
            assert "EMPTY" not in p[0], (name, p)
