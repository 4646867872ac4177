"""Multi-EXECUTOR evidence: the identical build job runs on Spark's
local-cluster master — separate executor JVMs with their own python-worker
pools, shuffle over netty between processes — and produces the same ranked
results as the single-JVM local build. This is the in-sandbox stand-in for
the north rule's spark-submit-on-a-multi-executor-cluster criterion (a real
deploy changes only the --master/--num-executors flags, cli.py)."""

import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="module")
def lc_spark():
    # the session-scoped local[N] SparkSession must not coexist: one JVM per
    # process. Run this module's session in a subprocess instead.
    return None


def test_build_on_separate_executors_matches_local(tmp_path_factory):
    import json
    import subprocess
    import sys

    script = r"""
import json, os, sys, tempfile
os.environ["PYTHONPATH"] = %(repo)r
sys.path.insert(0, %(repo)r)
from hadoopsearchengine_spark.session import get_spark_cluster
from hadoopsearchengine_spark.sources.pages import write_pages
from hadoopsearchengine_spark.plans.build_index import build_index
from hadoopsearchengine_spark.operators.wand import QueryEngine

d = sys.argv[1]
spark = get_spark_cluster(2, 2, 3072)
assert "local-cluster" in spark.sparkContext.master
write_pages(spark, 200, f"{d}/pages")
build_index(spark, f"{d}/pages", f"{d}/idx", block_docs=64,
            head_df_threshold=100, pagerank_iters=3)
qe = QueryEngine(f"{d}/idx")
out = {q: qe.search(q, k=5) for q in ("global warming", "world cup final")}
print("LCRESULT " + json.dumps(out))
""" % {"repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}

    d = tempfile.mkdtemp(prefix="sfe_lc_test_")
    try:
        r = subprocess.run([sys.executable, "-c", script, d],
                           capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("LCRESULT ")][-1]
        lc = json.loads(line[len("LCRESULT "):])

        # reference: same corpus/params built on the plain local session in
        # a second subprocess (same deterministic corpus generator)
        script2 = script.replace("get_spark_cluster(2, 2, 3072)",
                                 "get_spark('lc-ref', cores=4)") \
                        .replace("from hadoopsearchengine_spark.session "
                                 "import get_spark_cluster",
                                 "from hadoopsearchengine_spark.session "
                                 "import get_spark") \
                        .replace('assert "local-cluster" in '
                                 'spark.sparkContext.master', "pass")
        d2 = tempfile.mkdtemp(prefix="sfe_lc_ref_")
        try:
            r2 = subprocess.run([sys.executable, "-c", script2, d2],
                                capture_output=True, text=True, timeout=900)
            assert r2.returncode == 0, r2.stderr[-2000:]
            line2 = [ln for ln in r2.stdout.splitlines()
                     if ln.startswith("LCRESULT ")][-1]
            ref = json.loads(line2[len("LCRESULT "):])
        finally:
            shutil.rmtree(d2, ignore_errors=True)

        for q in lc:
            got_ids = [t[0] for t in lc[q]]
            want_ids = [t[0] for t in ref[q]]
            assert got_ids == want_ids, (q, lc[q], ref[q])
            for (_, s1), (_, s2) in zip(lc[q], ref[q]):
                assert abs(s1 - s2) <= 1e-6
    finally:
        shutil.rmtree(d, ignore_errors=True)
