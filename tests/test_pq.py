"""Product-quantization + linear-probe unit tests (round 5): code-range
and partition-invariance properties for the PQ encoder, a from-scratch
Python replay of the ADC distance for one query, and an exact recompute
of one linear-probe score."""

from __future__ import annotations

import math

from real_time_big_data_iot_monitoring_pipeline_spark.operators import similarity
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import REGISTRY
from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table

M, DSUB, K = 8, 8, 16


def _emb(spark, sf_dir):
    return similarity.as_double_vec(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )


def test_pq_codes_in_range_and_partition_invariant(spark, sf_dir):
    e = _emb(spark, sf_dir)
    books = similarity.pq_codebooks(e, M, DSUB, K)
    assert len(books) == M and len(books[0]) == K and len(books[0][0]) == DSUB
    enc = similarity.pq_encode(e, books).select(
        "vec_id", *[f"code_{s:02d}" for s in range(M)]
    )
    rows = {r.vec_id: r for r in enc.collect()}
    for r in rows.values():
        for s in range(M):
            assert 0 <= r[f"code_{s:02d}"] < K
    # a seed vector must encode to its own codebook index in every subspace
    seeds = similarity.seed_rows(e, K)
    for j, (vid, _vec) in enumerate(seeds):
        for s in range(M):
            # distance to its own centroid is 0 — the unique minimum unless
            # another seed shares the subvector, in which case first-min
            # tie-break keeps the smaller index
            assert rows[vid][f"code_{s:02d}"] <= j
    enc2 = similarity.pq_encode(e.repartition(13), books).select(
        "vec_id", *[f"code_{s:02d}" for s in range(M)]
    )
    assert sorted(map(tuple, enc2.collect())) == sorted(map(tuple, enc.collect()))


def test_pq_adc_matches_python_replay(spark, sf_dir):
    e = _emb(spark, sf_dir)
    books = similarity.pq_codebooks(e, M, DSUB, K)
    out = REGISTRY["embedding_pq_topk"].build(spark, sf_dir)
    got = [r for r in out.collect() if r.rank <= 3]
    # full Python replay: encode every vector, ADC for every query
    vecs = {
        r.vec_id: [similarity._qint(v) for v in r.embedding] for r in e.collect()
    }

    def sqd(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    codes = {
        vid: [
            min(
                range(K),
                key=lambda j: (sqd(v[s * DSUB : (s + 1) * DSUB], books[s][j]), j),
            )
            for s in range(M)
        ]
        for vid, v in vecs.items()
    }
    qids = sorted(vecs)[:5]
    for row in got:
        qsub = [vecs[row.query_id][s * DSUB : (s + 1) * DSUB] for s in range(M)]
        want = sum(sqd(qsub[s], books[s][codes[row.cand_id][s]]) for s in range(M))
        assert row.adc_dist == want
    # ranks per query are 1..k dense and candidates exclude the query itself
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r.query_id, []).append(r)
        assert r.cand_id != r.query_id
    for q, rs in per_q.items():
        assert q in qids
        assert sorted(x.rank for x in rs) == list(range(1, len(rs) + 1))


def test_linear_probe_score_exact(spark, sf_dir):
    from real_time_big_data_iot_monitoring_pipeline_spark.plans.mlprep_queries import _PROBE_W

    out = REGISTRY["embedding_linear_probe"].build(spark, sf_dir)
    sample = out.orderBy("vec_id").limit(3).collect()
    e = _emb(spark, sf_dir)
    vecs = {r.vec_id: r.embedding for r in e.orderBy("vec_id").limit(3).collect()}
    for r in sample:
        acc = 0.0
        for x, w in zip(vecs[r.vec_id], _PROBE_W):
            acc += similarity._qint(x) * w  # same left-fold order as both engines
        assert r.score == round(acc / 1e6 + 1e-8, 6)
        assert r.predicted == (acc > 0)


def test_pq_encode_fast_matches_expression_twin(spark, sf_dir):
    e = _emb(spark, sf_dir)
    books = similarity.pq_codebooks(e, M, DSUB, K)
    slow = {
        r.vec_id: tuple(r[f"code_{s:02d}"] for s in range(M))
        for r in similarity.pq_encode(e, books).collect()
    }
    fast = {r.vec_id: tuple(r.codes) for r in similarity.pq_encode_fast(e, books).collect()}
    assert fast == slow
