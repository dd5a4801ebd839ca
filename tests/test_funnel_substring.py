"""Funnel / cohort-retention (stages/funnel.py) and repeated-k-gram
substring dedup (stages/substring.py).  E2E oracle equivalence is
covered by test_queries_oracle.py; these pin operator semantics with
hand-computed expectations and edge cases the sf tables don't hit.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

US = 1_000_000
H = 3600 * US


def _events(rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "event_type"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    return df[["user_id", "ts", "event_type"]]


FUNNEL_ROWS = [
    # u1 completes all three within the window
    (1, 0 * H, "signup"), (1, 1 * H, "click"), (1, 2 * H, "purchase"),
    # u2: purchase BEFORE click -> stalls at stage 2
    (2, 0 * H, "signup"), (2, 5 * H, "click"), (2, 3 * H, "purchase"),
    # u3: click lands outside the 72h window -> stage 1
    (3, 0 * H, "signup"), (3, 73 * H, "click"), (3, 74 * H, "purchase"),
    # u4: no signup -> excluded entirely
    (4, 0 * H, "click"), (4, 1 * H, "purchase"),
    # u5: click exactly at the deadline boundary (inclusive)
    (5, 0 * H, "signup"), (5, 72 * H, "click"),
    # u6: click at the same instant as signup (ts >= t1 qualifies)
    (6, 10 * H, "signup"), (6, 10 * H, "click"), (6, 11 * H, "purchase"),
]

FUNNEL_WANT = {
    # user: (stage, t1, t2, t3) in hours (-1 = unreached)
    1: (3, 0, 1, 2),
    2: (2, 0, 5, -1),
    3: (1, 0, -1, -1),
    5: (2, 0, 72, -1),
    6: (3, 10, 10, 11),
}


def _check_funnel(df: pd.DataFrame):
    got = {
        int(r.user_id): (
            int(r.stage_reached),
            int(r.t1_us) // H,
            int(r.t2_us) // H if r.t2_us >= 0 else -1,
            int(r.t3_us) // H if r.t3_us >= 0 else -1,
        )
        for r in df.itertuples()
    }
    assert got == FUNNEL_WANT


def test_funnel_reference_semantics():
    from gliner_cpp_ray.stages.funnel import funnel_step_times

    out = funnel_step_times(
        _events(FUNNEL_ROWS), ["signup", "click", "purchase"], 72 * 3600
    )
    _check_funnel(out)


def test_funnel_distributed_matches_reference(ray_session):
    from gliner_cpp_ray.stages.funnel import funnel_within

    ds = rd.from_pandas(_events(FUNNEL_ROWS)).repartition(4)
    out = funnel_within(
        ds, ["signup", "click", "purchase"], 72 * 3600, n_buckets=3
    ).to_pandas()
    _check_funnel(out)


def test_funnel_no_first_step_events():
    from gliner_cpp_ray.stages.funnel import funnel_step_times

    out = funnel_step_times(
        _events([(1, 0, "click")]), ["signup", "click"], 3600
    )
    assert len(out) == 0
    assert list(out.columns) == ["user_id", "stage_reached", "t1_us", "t2_us"]


def test_weekly_retention_grid(ray_session):
    from gliner_cpp_ray.stages.funnel import WEEK_US, weekly_retention

    rows = []
    # u1 first active week 0, returns weeks 1 and 3 (many events/week)
    for w in (0, 1, 3):
        rows += [(1, w * WEEK_US + i * H, "view") for i in range(3)]
    # u2 cohort week 1, returns week 2
    rows += [(2, 1 * WEEK_US, "view"), (2, 2 * WEEK_US + H, "view")]
    # u3 cohort week 0 only
    rows += [(3, 5 * H, "view")]
    ds = rd.from_pandas(_events(rows)).repartition(3)
    got = (
        weekly_retention(ds, n_buckets=2)
        .to_pandas()
        .set_index(["cohort_week", "week_offset"])["n_users"]
        .to_dict()
    )
    assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 1): 1}


def test_kgram_hashes_batch_invariant_and_positions():
    from gliner_cpp_ray.stages.substring import kgram_hashes

    texts = ["abcdefgh", "xxabcdefghzz", "tiny"]
    di, pos, h = kgram_hashes(texts, k=6)
    # "tiny" (len 4 < k) contributes nothing
    assert set(di) == {0, 1}
    # same 6-gram "abcdef" at doc0 pos0 and doc1 pos2 hashes identically
    m0 = {(d, p): v for d, p, v in zip(di, pos, h)}
    assert m0[(0, 0)] == m0[(1, 2)]
    assert m0[(0, 1)] == m0[(1, 3)]  # "bcdefg"
    # batch-of-one produces identical hashes (concat masking is sound)
    for i, t in enumerate(texts[:2]):
        di1, pos1, h1 = kgram_hashes([t], k=6)
        want = {(0, p): v for d, p, v in zip(di1, pos1, h1)}
        got = {(0, p): v for (d, p), v in m0.items() if d == i}
        assert got == want


def test_kgram_hashes_unicode_codepoints():
    from gliner_cpp_ray.stages.substring import kgram_hashes

    # non-BMP emoji: one codepoint, positions stay codepoint-indexed
    a = "🎉abcde"
    b = "zz🎉abcde"
    da, pa_, ha = kgram_hashes([a], k=4)
    db, pb, hb = kgram_hashes([b], k=4)
    ma = dict(zip(pa_, ha))
    mb = dict(zip(pb, hb))
    assert ma[0] == mb[2]  # "🎉abc" at codepoint offsets 0 / 2


def test_kgram_sampling_is_content_defined():
    from gliner_cpp_ray.stages.substring import kgram_hashes

    # mod-sampling keeps windows by CONTENT (h % s == 0), so a shared
    # substring keeps the same windows in both docs regardless of the
    # (deliberately different, misaligned) prefixes
    shared = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    t1 = "xy" + shared + "qq"
    t2 = "zzz" + shared + "w"
    k, s = 14, 3
    _, p1, h1 = kgram_hashes([t1], k=k, sample_mod=s)
    _, p2, h2 = kgram_hashes([t2], k=k, sample_mod=s)
    in1 = {p - 2: v for p, v in zip(p1, h1) if 2 <= p <= 2 + len(shared) - k}
    in2 = {p - 3: v for p, v in zip(p2, h2) if 3 <= p <= 3 + len(shared) - k}
    assert in1 and in1 == in2  # identical kept set at shared offsets
    assert all(v % s == 0 for v in h1)  # the selection predicate
    # full enumeration is a superset: sampling only drops windows
    _, pf, hf = kgram_hashes([t1], k=k)
    kept = {(p, v) for p, v in zip(p1, h1)}
    assert kept <= {(p, v) for p, v in zip(pf, hf)}


def test_repeated_kgram_stats(ray_session):
    from gliner_cpp_ray.stages.substring import repeated_kgram_stats

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps",
                "xx the quick brown fox sleeps",
                "completely different words here",
                "shorty",  # len 6 < k -> zero grams
            ],
        }
    )
    k = 10
    got = (
        repeated_kgram_stats(rd.from_pandas(docs).repartition(3), k=k)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # closed-form: count window positions whose gram appears in >=2 docs
    grams = {
        d: {t[i : i + k] for i in range(len(t) - k + 1)}
        for d, t in zip(docs.doc_id, docs.text)
    }
    for d, t in zip(docs.doc_id, docs.text):
        n = max(len(t) - k + 1, 0)
        dup = sum(
            1
            for i in range(n)
            if any(
                t[i : i + k] in grams[o] for o in grams if o != d
            )
        )
        assert got.loc[d, "n_grams"] == n
        assert got.loc[d, "dup_grams"] == dup
    assert got.loc[4, "n_grams"] == 0 and got.loc[4, "dup_grams"] == 0
    assert got.loc[1, "dup_grams"] > 0  # the shared prefix is caught
