"""Property-based tests (hypothesis) for the round-2 pipeline operators:
random inputs checked against brute-force Python references — connected
components vs union-find, sessionization vs a linear scan, gap-fill vs a
dict-based forward fill.  These catch the structural edge cases fixed
fixtures miss (odd graph shapes, coincident timestamps, single-bucket
keys)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_big_data_iot_monitoring_pipeline_spark.operators import dedup, timeseries


# --- components vs union-find ------------------------------------------------
edges_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=60,
)


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {n: find(n) for n in parent}
    # normalize root to the component MIN id
    groups: dict[int, list[int]] = {}
    for n, r in comp.items():
        groups.setdefault(r, []).append(n)
    out = {}
    for members in groups.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges_strategy)
def test_components_match_union_find(spark, pairs):
    pairs = list({(min(a, b), max(a, b)) for a, b in pairs})
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r.doc_id: (r.component_id, r.component_size) for r in dedup.duplicate_components(df).collect()}
    want = _union_find(pairs)
    sizes: dict[int, int] = {}
    for n, c in want.items():
        sizes[c] = sizes.get(c, 0) + 1
    assert {n: c for n, (c, _) in got.items()} == want
    assert all(s == sizes[c] for _, (c, s) in got.items())


# --- sessionize vs linear scan -----------------------------------------------
events_strategy = st.lists(
    st.tuples(
        st.integers(1, 3),               # user
        st.integers(0, 20000),           # seconds
        st.integers(-999, 999),          # value cents
    ),
    min_size=1,
    max_size=50,
)


def _sessionize_py(rows, gap_s):
    # rows: (event_id, user, sec, value); order by (sec, event_id) per user
    by_user: dict[int, list] = {}
    for eid, u, sec, v in rows:
        by_user.setdefault(u, []).append((sec, eid, v))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        sessions: dict[int, list] = {}
        for sec, eid, v in evs:
            if prev is None or sec - prev > gap_s:
                sid += 1
            prev = sec
            sessions.setdefault(sid, []).append((sec, v))
        for sid, items in sessions.items():
            secs = [s for s, _ in items]
            cents = sum(round(v * 100) for _, v in items)
            out[(u, sid)] = (
                min(secs) * 1_000_000,
                max(secs) * 1_000_000,
                len(items),
                round(cents / 100.0 + 1e-8, 2),
            )
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_sessionize_matches_linear_scan(spark, raw):
    rows = [(i, u, sec, c / 100.0) for i, (u, sec, c) in enumerate(raw)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "sec", "value"]).select(
        "event_id", "user_id", F.timestamp_seconds(F.col("sec")).alias("ts"), "value"
    )
    got = {
        (r.user_id, r.session_id): (r.session_start_us, r.session_end_us, r.n_events, r.sum_value)
        for r in timeseries.sessionize(df, "user_id", "ts", "event_id", "value", gap_seconds=600).collect()
    }
    want = _sessionize_py(rows, 600)
    assert got == want


# --- gap fill vs dict forward fill -------------------------------------------
buckets_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(100, 900)),  # (hour, value cents)
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(buckets_strategy)
def test_gap_fill_matches_python(spark, raw):
    rows = [(i, "k", h * 3600 + 5, c / 100.0) for i, (h, c) in enumerate(raw)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "sec", "value"]).select(
        "event_id", "event_type", F.timestamp_seconds(F.col("sec")).alias("ts"), "value"
    )
    got = {
        r.bucket: (r.n_events, r.avg_value, r.avg_value_ff, r.is_gap)
        for r in timeseries.resample_gap_fill(df, "event_type", "ts", "value").collect()
    }
    per_bucket: dict[int, list[int]] = {}
    for _, (h, c) in enumerate(raw):
        per_bucket.setdefault(h, []).append(c)
    lo, hi = min(per_bucket), max(per_bucket)
    assert set(got) == set(range(lo, hi + 1))
    last = None
    for b in range(lo, hi + 1):
        if b in per_bucket:
            cents = per_bucket[b]
            avg = round(sum(cents) / (100.0 * len(cents)) + 1e-8, 4)
            last = avg
            assert got[b] == (len(cents), avg, avg, 0), b
        else:
            assert got[b] == (0, None, last, 1), b


# --- sequence packing vs a sequential reference ------------------------------
pack_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(1, 50)),  # (stratum, n_tokens)
    min_size=1,
    max_size=40,
)


@given(docs=pack_strategy, budget=st.integers(2, 24))
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_sequences_matches_sequential_reference(spark, docs, budget):
    """pack_sequences must equal a sequential Python layout: walk each
    stratum's docs in (knuth_hash(id), id) order, append token ranges,
    and slice at every multiple of the budget."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators import sampling

    rows = [(i, str(s), n) for i, (s, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    got = {
        (r.lang, r.seq, r.doc_id): (r.span_offset, r.span_tokens)
        for r in sampling.pack_sequences(
            df, "lang", seq_tokens=budget, tokens_col="n_tokens"
        ).collect()
    }

    want = {}
    by_stratum: dict[str, list[tuple[int, int]]] = {}
    for i, (s, n) in enumerate(docs):
        by_stratum.setdefault(str(s), []).append((i, n))
    for lang, members in by_stratum.items():
        members.sort(key=lambda t: ((t[0] * 2654435761) % 2**32, t[0]))
        pos = 0
        for doc_id, n in members:
            start, end = pos, pos + n
            for seq in range(start // budget, (end - 1) // budget + 1):
                lo, hi = max(seq * budget, start), min((seq + 1) * budget, end)
                want[(lang, seq, doc_id)] = (lo - start, hi - lo)
            pos = end
    assert got == want


# --- overlapping chunking vs a sequential reference --------------------------
chunk_strategy = st.lists(st.integers(0, 200), min_size=1, max_size=40)


@given(lens=chunk_strategy, chunk=st.integers(2, 32), overlap=st.integers(0, 1))
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunk_tokens_matches_sequential_reference(spark, lens, chunk, overlap):
    """chunk_tokens must equal the obvious per-document Python chunker:
    starts at every stride until the tail is covered, each chunk
    min(chunk, n - start) tokens, zero-token docs absent.  Stride is
    chunk or chunk-1 (overlap 0/1 scaled down to the tiny budgets)."""
    from real_time_big_data_iot_monitoring_pipeline_spark.operators import sampling

    stride = chunk - overlap
    rows = [(i, n) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        (r.doc_id, r.chunk_idx): (r.tok_start, r.tok_len)
        for r in sampling.chunk_tokens(
            df, tokens_col="n_tok", chunk=chunk, stride=stride
        ).collect()
    }
    want = {}
    for i, n in enumerate(lens):
        if n == 0:
            continue
        idx = 0
        start = 0
        while True:
            want[(i, idx)] = (start, min(chunk, n - start))
            if start + chunk >= n:
                break
            idx += 1
            start += stride
    assert got == want


def test_rademacher_projection_preserves_distances(spark, sf_dir):
    """Johnson-Lindenstrauss sanity: the 64->16 Rademacher projection
    must roughly preserve pairwise geometry — squared-distance ratios
    (scaled by dim_in/dim_out) concentrate near 1, and the sign matrix
    is balanced."""
    import numpy as np

    from real_time_big_data_iot_monitoring_pipeline_spark.operators.similarity import (
        rademacher_signs,
    )

    S = np.array(rademacher_signs(64, 16), dtype=np.float64)
    # balanced signs: each direction is near-zero-mean
    assert abs(S.mean()) < 0.2
    from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY

    proj = (
        REGISTRY["embedding_random_projection"]
        .build(spark, sf_dir)
        .orderBy("vec_id")
        .limit(40)
        .toPandas()
    )
    from real_time_big_data_iot_monitoring_pipeline_spark.sources.tables import load_table

    orig = (
        load_table(spark, sf_dir, "embeddings")
        .orderBy("vec_id")
        .limit(40)
        .toPandas()
    )
    X = np.vstack(orig["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
    P = proj.drop(columns=["vec_id"]).to_numpy()
    rng = np.random.default_rng(7)
    ratios = []
    for _ in range(60):
        i, j = rng.choice(len(X), 2, replace=False)
        d_orig = np.sum((X[i] - X[j]) ** 2)
        d_proj = np.sum((P[i] - P[j]) ** 2)
        if d_orig > 1e-9:
            # E[d_proj] = dim_out * d_orig for +-1 signs (no 1/sqrt(k) scaling)
            ratios.append(d_proj / (16.0 * d_orig))
    ratios = np.array(ratios)
    assert 0.5 < np.median(ratios) < 2.0, ratios
