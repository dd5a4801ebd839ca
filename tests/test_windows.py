"""Windowed/stream-shaped operators: bucketed sessionization."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_session_counts_bucketed_matches_per_key_reference(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import (
        session_counts,
        sessions_per_key_reference,
    )

    rng = np.random.default_rng(7)
    n = 3000
    users = rng.integers(0, 120, n)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # bursty timestamps: many intra-session gaps, some > 30 min
    ts = base + np.sort(rng.integers(0, 86_400_000_000 * 3, n)).astype(
        "timedelta64[us]"
    )
    df = pd.DataFrame({"user_id": users, "ts": pd.to_datetime(ts)})

    got = (
        session_counts(
            rd.from_pandas(df).repartition(7), gap_s=1800, n_buckets=5
        )
        .to_pandas()
        .set_index("user_id")["n_sessions"]
        .to_dict()
    )
    want = {
        int(u): sessions_per_key_reference(g, "user_id", "ts", 1800)
        for u, g in df.groupby("user_id")
    }
    assert got == want
    # no one-row-per-key frames: bucket count bounds the group count
    assert len(got) == len(want) == df["user_id"].nunique()


def test_sliding_counts_sparse_wide_range(ray_session):
    """A bucket-id range spanning ~10^9 with only a handful of populated
    buckets must complete in O(present buckets) — the dense-reindex
    implementation would allocate a 10^9-row index here."""
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import sliding_counts

    # second-granularity buckets: 0 (2 events), 1 (1), 10 (1), 10**9 (3)
    # — a 10^9-wide bucket range; the dense reindex would allocate an
    # ~8 GB index for these 4 populated buckets
    bucket_of = [0, 0, 1, 10, 10**9, 10**9, 10**9]
    base = np.datetime64("1970-01-01T00:00:00.500", "us")
    ts = np.array([base + np.timedelta64(b, "s") for b in bucket_of])
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})

    out = sliding_counts(rd.from_arrow(t), step_s=1, span_steps=3)
    got = dict(zip(out["bucket"], out["n_window"]))
    # window (b-3, b]: bucket 0 -> 2; 1 -> 3; 2 -> 3 (trailing from 0,1);
    # 3 -> 1; 10 -> 1; 11/12 -> 1; 10**9 -> 3; beyond max(present) cut
    assert got == {0: 2, 1: 3, 2: 3, 3: 1, 10: 1, 11: 1, 12: 1, 10**9: 3}


def test_sliding_distinct_sparse_and_dedup(ray_session):
    """Sliding COUNT DISTINCT: duplicate (bucket, id) events collapse
    before replication; windows past the last active bucket are cut;
    a 10^6-wide empty gap costs nothing (pair-bounded plan)."""
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import sliding_distinct

    base = np.datetime64("1970-01-01T00:00:00.500", "us")

    def at(b):
        return base + np.timedelta64(int(b), "s")

    # bucket 0: users {1,1,2}; bucket 1: {2}; bucket 10**6: {3}
    bucket_of = [0, 0, 0, 1, 10**6]
    users = [1, 1, 2, 2, 3]
    t = pa.table(
        {
            "ts": pa.array([at(b) for b in bucket_of], pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
        }
    )
    out = sliding_distinct(
        rd.from_arrow(t), "ts", "user_id", step_s=1, span_steps=3
    ).to_pandas()
    got = dict(zip(out["bucket"], out["n_users"]))
    # window (b-3, b]: b=0 -> {1,2}; b=1 -> {1,2}; b=2 -> {1,2};
    # b=3 -> {2} (bucket-1 trail); b=10**6 -> {3}; nothing past max
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 10**6: 1}


def test_rolling_per_key_int64_exact_past_2_53(ray_session):
    """Window sums beyond 2^53 must stay integer-exact (a float64
    round-trip would corrupt the low bits)."""
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import rolling_per_key

    big = 2**60
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "user_id": np.zeros(4, np.int64),
            "ts": pd.to_datetime(
                np.datetime64("2024-01-01", "us")
                + np.arange(4).astype("timedelta64[s]")
            ),
            "value_micro": np.array([big, big + 1, big + 3, 7], np.int64),
        }
    )
    out = (
        rolling_per_key(
            rd.from_pandas(df), "user_id", "ts", "value_micro",
            "event_id", window=3, n_buckets=2,
        )
        .to_pandas()
        .set_index("event_id")["roll_sum"]
        .to_dict()
    )
    assert out == {
        0: big,
        1: 2 * big + 1,
        2: 3 * big + 4,
        3: (big + 1) + (big + 3) + 7,
    }


def test_debounce_events_lag_semantics(ray_session):
    """Debounce keeps a row iff first-of-key or > gap after the
    PREVIOUS RAW row (lag semantics): a chain of sub-gap rows is
    collapsed to its head even if the chain spans more than one gap
    total; a boundary gap of exactly gap_s is still a duplicate;
    equal timestamps (tie on ts) debounce deterministically by id."""
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import debounce_events

    base = np.datetime64("2024-01-01T00:00:00", "us")

    def at(s):
        return base + np.timedelta64(int(s * 1_000_000), "us")

    df = pd.DataFrame(
        {
            "event_id": np.arange(10, dtype=np.int64),
            "user_id": np.array([1, 1, 1, 1, 2, 2, 2, 1, 3, 3], np.int64),
            "event_type": ["a", "a", "a", "a", "a", "a", "b", "b", "c", "c"],
            "ts": pd.to_datetime(
                [
                    at(0),     # 0: (1,a) head -> keep
                    at(5),     # 1: +5s   -> drop
                    at(10),    # 2: +5s from row 1 (lag!) -> drop
                    at(21),    # 3: +11s  -> keep
                    at(0),     # 4: (2,a) head -> keep
                    at(10),    # 5: exactly gap_s after -> drop (strict >)
                    at(0),     # 6: (2,b) head -> keep
                    at(100),   # 7: (1,b) head -> keep
                    at(50),    # 8: (3,c) tie with row 9
                    at(50),    # 9: tie -> ordered by id; row 9 drops
                ]
            ),
        }
    )
    got = sorted(
        debounce_events(
            rd.from_pandas(df).repartition(4),
            ["user_id", "event_type"],
            "ts",
            "event_id",
            gap_s=10,
            n_buckets=3,
        )
        .to_pandas()["event_id"]
        .tolist()
    )
    assert got == [0, 3, 4, 6, 7, 8]


def test_lag_delta_per_key_edges(ray_session):
    """Single-row keys emit nothing; deltas follow (ts, id) order
    including ties; negative deltas exact."""
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import lag_delta_per_key

    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = [base + np.timedelta64(s, "s") for s in [0, 5, 5, 9, 0]]
    df = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "user_id": np.array([1, 1, 1, 1, 2], np.int64),
            "ts": pd.to_datetime(ts),
            "v": np.array([10, 7, 30, 4, 99], np.int64),
        }
    )
    got = (
        lag_delta_per_key(
            rd.from_pandas(df).repartition(3),
            ["user_id"], "ts", "event_id", "v", out_col="d", n_buckets=2,
        )
        .to_pandas()
        .sort_values("event_id")
    )
    # user 1 order: id0(10) -> id1(7) -> id2(30, ts tie by id) -> id3(4)
    assert got["event_id"].tolist() == [1, 2, 3]
    assert got["d"].tolist() == [-3, 23, -26]  # user 2: single row, omitted


def test_seq_numbers_per_key_multi_key_runs(ray_session):
    """Composite keys: a run breaks when ANY key column changes; ties
    within a key order by (ts, id)."""
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import seq_numbers_per_key

    t = pa.table(
        {
            "a": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "b": pa.array([1, 1, 2, 1, 1], pa.int64()),
            "ts": pa.array([10, 5, 7, 9, 9], pa.int64()),
            "id": pa.array([100, 101, 102, 103, 104], pa.int64()),
        }
    )
    got = {
        r["id"]: r["seq"]
        for r in seq_numbers_per_key(
            rd.from_arrow(t), ["a", "b"], "ts", "id"
        ).take_all()
    }
    # (1,1): ts 5 -> seq 1, ts 10 -> seq 2; (1,2): seq 1;
    # (2,1): equal ts 9 breaks ties by id
    assert got == {101: 1, 100: 2, 102: 1, 103: 1, 104: 2}


def test_assemble_key_histories_head_k_order_and_truncation(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.packing import assemble_key_histories

    t = pa.table(
        {
            "u": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "ts": pa.array([30, 10, 20, 40, 5], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ev": ["c", "a", "b", "d", "x"],
        }
    )
    got = {
        r["u"]: (r["n_events_used"], r["history"])
        for r in assemble_key_histories(
            rd.from_arrow(t), ["u"], "ts", "id", "ev", head_k=3
        ).take_all()
    }
    assert got == {1: (3, "a,b,c"), 2: (1, "x")}


def test_session_ids_per_key_gap_splits(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import session_ids_per_key

    t = pa.table(
        {
            "u": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "ts_us": pa.array([0, 50, 200, 210, 0], pa.int64()),
            "id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        }
    )
    got = {
        r["id"]: r["session_seq"]
        for r in session_ids_per_key(
            rd.from_arrow(t), ["u"], "ts_us", "id", gap_us=100
        ).take_all()
    }
    # user 1: 0,50 session 1; 200,210 session 2 (gap 150 > 100)
    assert got == {10: 1, 11: 1, 12: 2, 13: 2, 14: 1}


def test_grouped_exact_median_lower_median(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import grouped_exact_median

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 2, 2], pa.int64()),
            "v": pa.array([30, 10, 20, 4, 1, 3, 2], pa.int64()),
        }
    )
    got = {
        r["k"]: r["median"]
        for r in grouped_exact_median(
            rd.from_arrow(t), ["k"], "v"
        ).take_all()
    }
    # odd count -> middle; even count -> LOWER median
    assert got == {1: 20, 2: 2}


def test_interarrival_per_key_matches_pandas(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import interarrival_per_key

    rng = np.random.default_rng(11)
    n = 2000
    users = rng.integers(0, 80, n).astype(np.int64)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 86_400_000_000, n).astype("timedelta64[us]")
    # force ties: several events share a timestamp, order falls to id
    ts[100:110] = ts[100]
    df = pd.DataFrame(
        {
            "user_id": users,
            "ts": pd.to_datetime(ts),
            "event_id": np.arange(n, dtype=np.int64),
        }
    )
    got = (
        interarrival_per_key(
            rd.from_pandas(df).repartition(7),
            key_col="user_id", ts_col="ts", id_col="event_id",
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    ref = df.sort_values(["user_id", "ts", "event_id"], kind="stable").copy()
    t_us = ref["ts"].astype("int64")
    gap = t_us.groupby(ref["user_id"]).diff().dropna().astype(np.int64)
    rg = pd.DataFrame({"user_id": ref.loc[gap.index, "user_id"], "g": gap})
    grp = rg.groupby("user_id")["g"]
    want = pd.DataFrame(
        {
            "n_gaps": grp.size().astype(np.int64),
            "min_gap_us": grp.min().astype(np.int64),
            "max_gap_us": grp.max().astype(np.int64),
        }
    ).reset_index()
    want["mean_gap_us"] = (
        grp.sum().to_numpy() // grp.size().to_numpy()
    ).astype(np.int64)
    pd.testing.assert_frame_equal(
        got, want[got.columns.tolist()], check_dtype=False
    )


def test_interarrival_singletons_absent(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import interarrival_per_key

    df = pd.DataFrame(
        {
            "user_id": np.array([1, 2, 2], dtype=np.int64),
            "ts": pd.to_datetime(
                np.array(
                    ["2024-01-01T00:00:00", "2024-01-01T01:00:00",
                     "2024-01-01T01:30:00"],
                    dtype="datetime64[us]",
                )
            ),
            "event_id": np.arange(3, dtype=np.int64),
        }
    )
    got = interarrival_per_key(
        rd.from_pandas(df), key_col="user_id", ts_col="ts",
        id_col="event_id",
    ).to_pandas()
    assert got["user_id"].tolist() == [2]
    assert got["n_gaps"].tolist() == [1]
    assert got["min_gap_us"].tolist() == [1_800_000_000]


def test_dwell_by_attr_attribution(ray_session):
    """Dwell attributed to the EARLIER event's attr; last event per key
    contributes nothing; cross-key gaps masked."""
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import dwell_by_attr

    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
            "ts": pd.to_datetime(
                np.array(
                    ["2024-01-01T00:00:00", "2024-01-01T00:00:10",
                     "2024-01-01T00:01:10", "2024-01-01T09:00:00",
                     "2024-01-01T09:00:05"],
                    dtype="datetime64[us]",
                )
            ),
            "event_id": np.arange(5, dtype=np.int64),
            "event_type": ["a", "b", "a", "a", "b"],
        }
    )
    got = (
        dwell_by_attr(
            rd.from_pandas(df).repartition(3), key_col="user_id",
            ts_col="ts", id_col="event_id", attr_col="event_type",
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    # 'a' owns gaps: u1 e0->e1 (10s), u2 e3->e4 (5s) = n2 total 15s
    # 'b' owns gap:  u1 e1->e2 (60s)                 = n1 total 60s
    assert got["event_type"].tolist() == ["a", "b"]
    assert got["n_dwells"].tolist() == [2, 1]
    assert got["total_dwell_us"].tolist() == [15_000_000, 60_000_000]
    assert got["mean_dwell_us"].tolist() == [7_500_000, 60_000_000]


def test_trailing_range_sum_peers_and_boundaries(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gliner_cpp_ray.stages.windows import trailing_range_sum

    # key 1: ties at t=100 (peers must both see BOTH peer values),
    # t=200 exactly range away from t=100 (boundary INCLUDED),
    # t=301 just past range from t=201. key 2: isolation check.
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2],
            "t": [100, 100, 200, 301, 100, 150],
            "v": [1, 2, 4, 8, 16, 32],
            "id": [0, 1, 2, 3, 4, 5],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = {r["id"]: r["range_sum"] for r in
           trailing_range_sum(ds, "k", "t", "v", "id",
                              range_us=100).take_all()}
    # id0/id1 are peers at t=100: frame = both → 3
    assert got[0] == 3 and got[1] == 3
    # id2 at t=200: [100,200] includes the peers → 1+2+4
    assert got[2] == 7
    # id3 at t=301: [201,301] → only itself
    assert got[3] == 8
    # key 2 never sees key 1
    assert got[4] == 16 and got[5] == 48

    # exactness past 2^53 (float64 would lose it)
    big = 2**60
    df2 = pd.DataFrame(
        {"k": [7, 7], "t": [0, 1], "v": [big, big + 3], "id": [0, 1]}
    )
    got2 = {r["id"]: r["range_sum"] for r in
            trailing_range_sum(
                rd.from_arrow(pa.Table.from_pandas(df2, preserve_index=False)),
                "k", "t", "v", "id", range_us=10).take_all()}
    assert got2[1] == 2 * big + 3
