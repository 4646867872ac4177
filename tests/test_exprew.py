"""Expected-reward random-walk re-rank (operators.exprew): the distributed
recurrence must match a plain-numpy replay of the reference algorithm
(ExpRew.h ApproxTravProb), flag recurrent (too-central) docs, and drop
non-candidate edges."""

import numpy as np

from hadoopsearchengine_spark.operators.exprew import expected_reward


def _numpy_oracle(cand, edges, iters, threshold):
    act = sorted({u for u, v, _ in edges} | {v for _, v, _ in edges})
    idx = {d: i for i, d in enumerate(act)}
    w = {}
    for u, v, x in edges:
        w[(u, v)] = w.get((u, v), 0.0) + x
    out_sum = {}
    for (u, v), x in w.items():
        out_sum[u] = out_sum.get(u, 0.0) + x
    mat = np.zeros((len(act), len(act)))
    for (u, v), x in w.items():
        mat[idx[u], idx[v]] = round(x / out_sum[u], 9)
    p = np.ones(len(act))
    for _ in range(iters):
        p = p + mat.T @ p
        p = p / p.sum()
    probs = {d: round(float(p[idx[d]]), 6) for d in act}
    return probs


def test_expected_reward_matches_numpy_and_flags_recurrent(spark):
    # a hub (1) every other candidate links to -> hub mass concentrates ->
    # recurrent; a non-candidate doc (99) must be excluded entirely
    cand = spark.createDataFrame([(d,) for d in (1, 2, 3, 4)],
                                 "doc_id long")
    raw = [(2, 1, 1.0), (3, 1, 1.0), (4, 1, 1.0), (1, 2, 0.5),
           (2, 3, 0.25), (99, 1, 9.0), (1, 99, 9.0)]
    links = spark.createDataFrame(raw, "src long, dst long, weight double")
    got = {r["doc_id"]: r for r in
           expected_reward(cand, links, iterations=6,
                           threshold=0.4).collect()}
    want = _numpy_oracle(
        cand=[1, 2, 3, 4],
        edges=[(u, v, x) for u, v, x in raw if u != 99 and v != 99],
        iters=6, threshold=0.4)
    assert set(got) == set(want)          # 99 excluded, all actives present
    for d, pv in want.items():
        assert abs(got[d]["trav_prob"] - pv) < 1e-9, (d, got[d], pv)
    assert got[1]["recurrent"] and got[1]["rank"] is None
    ranked = sorted((r for r in got.values() if not r["recurrent"]),
                    key=lambda r: r["rank"])
    probs = [r["trav_prob"] for r in ranked]
    assert probs == sorted(probs, reverse=True)
    assert [r["rank"] for r in ranked] == list(range(1, len(ranked) + 1))
