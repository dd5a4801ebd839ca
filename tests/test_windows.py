"""Windowed/stream-shaped operators: bucketed sessionization."""

import numpy as np
import pandas as pd


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
