"""Tests for the training-data-pipeline operators added in round 3:
PII redaction, repetition stats, dataset mixture, n-gram contamination
and sequence packing."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from gliner_cpp_ray.stages.text_analysis import pii_redact, repetition_stats


def tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_pii_redact_counts_and_replacement():
    out = pii_redact(
        tbl(
            [
                "mail bob.smith+x@foo-bar.co.uk now",
                "call +14155551234 or +442071234567",
                "host 10.0.0.1 and 192.168.255.3",
                "mixed a@b.io +1234567 1.2.3.4",
                "clean text with no pii at all",
                "",
            ]
        )
    )
    assert out.column("n_email").to_pylist() == [1, 0, 0, 1, 0, 0]
    assert out.column("n_phone").to_pylist() == [0, 2, 0, 1, 0, 0]
    assert out.column("n_ip").to_pylist() == [0, 0, 2, 1, 0, 0]
    red = out.column("redacted").to_pylist()
    assert red[0] == "mail <EMAIL> now"
    assert red[1] == "call <PHONE> or <PHONE>"
    assert red[2] == "host <IP> and <IP>"
    assert red[3] == "mixed <EMAIL> <PHONE> <IP>"
    assert red[4] == "clean text with no pii at all"
    assert red[5] == ""


def test_pii_redact_matches_duckdb_regexes():
    """pyarrow and DuckDB must agree on every pattern (both RE2)."""
    import duckdb

    from gliner_cpp_ray.stages.text_analysis import PII_PATTERNS

    texts = [
        "a@b.c x@y.io not@an@email +12345678 ip 1.2.3.4. 999.1.1.1",
        "trailing dot a.b@c.de. +1 (555) 1234 10.20.30.40x",
    ]
    out = pii_redact(tbl(texts))
    con = duckdb.connect()
    con.register("t", tbl(texts))
    for name, pat, repl in PII_PATTERNS:
        sql = con.execute(
            f"SELECT len(regexp_extract_all(text, '{pat}')) FROM t ORDER BY doc_id"
        ).fetchall()
        assert out.column(f"n_{name}").to_pylist() == [r[0] for r in sql], name


def test_repetition_stats_known_values():
    out = repetition_stats(
        tbl(
            [
                "a b a b a b",        # 6 tokens, 2 distinct, 5 bigrams, top "a b" x3
                "x y z",              # 3 tokens, 3 distinct, 2 bigrams, top 1
                "solo",               # 1 token, 0 bigrams
                "",                   # empty
                "The the THE",        # lowercased: 3 tokens, 1 distinct, top "the the" x2
            ]
        )
    )
    assert out.column("n_tokens").to_pylist() == [6, 3, 1, 0, 3]
    assert out.column("n_distinct_tokens").to_pylist() == [2, 3, 1, 0, 1]
    assert out.column("n_bigrams").to_pylist() == [5, 2, 0, 0, 2]
    assert out.column("top_bigram_n").to_pylist() == [3, 1, 0, 0, 2]


def test_repetition_stats_bigrams_do_not_cross_docs():
    # last token of doc 0 == first token of doc 1: must NOT form a bigram
    out = repetition_stats(tbl(["p q", "q r"]))
    assert out.column("n_bigrams").to_pylist() == [1, 1]
    assert out.column("top_bigram_n").to_pylist() == [1, 1]


def test_dataset_mixture_rates(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.skew import dataset_mixture, split_threshold_hex

    n = 400
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "src": ["all", "none", "half", "other"] * (n // 4),
        }
    )
    rates = {"all": 100, "none": 0, "half": 50}
    kept = (
        dataset_mixture(
            rd.from_pandas(df).repartition(4), "doc_id", "src", rates,
            default_pct=0,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    # expected membership from the same md5 predicate, computed directly
    th = split_threshold_hex(50)
    exp = [
        i
        for i, s in zip(df["doc_id"], df["src"])
        if s == "all"
        or (s == "half" and hashlib.md5(str(i).encode()).hexdigest()[:8] < th)
    ]
    assert kept["doc_id"].tolist() == exp
    assert set(kept["src"]) <= {"all", "half"}
    # the 50% gate lands near half on 100 uniform ids
    n_half = (kept["src"] == "half").sum()
    assert 30 <= n_half <= 70


def test_ngram_contamination_counts(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.dedup import ngram_contamination, ngram_hash_set
    from gliner_cpp_ray.stages.skew import split_threshold_hex

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    # force heavy overlap: doc 1 copies doc 0's text plus a unique tail
    texts[1] = texts[0] + " zz1 zz2 zz3"
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(4)

    out = (
        ngram_contamination(ds, n=3, train_pct=80)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # pure-python replication of the semantics
    th = split_threshold_hex(80)
    is_train = {
        i: hashlib.md5(str(i).encode()).hexdigest()[:8] < th
        for i in range(len(texts))
    }
    train_grams = set()
    for i, t in enumerate(texts):
        if is_train[i]:
            train_grams.update(ngram_hash_set(t, 3).tolist())
    exp = []
    for i, t in enumerate(texts):
        if is_train[i]:
            continue
        g = set(ngram_hash_set(t, 3).tolist())
        exp.append((i, len(g), len(g & train_grams)))
    exp.sort()
    got = list(
        zip(out["doc_id"], out["n_grams"], out["n_contaminated"])
    )
    assert got == exp
    # sanity: the test split is non-trivial and some contamination exists
    assert len(exp) > 0 and any(c > 0 for _, _, c in exp)


def test_pack_sequences_prefix_sum(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(11)
    n = 300
    counts = rng.integers(1, 40, n)
    df = pd.DataFrame({"doc_id": range(n), "n_tokens": counts})
    out = (
        pack_sequences(
            rd.from_pandas(df.sample(frac=1, random_state=3)).repartition(5),
            budget=100,
            n_buckets=7,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    excl = np.concatenate([[0], counts.cumsum()[:-1]])
    assert out["doc_id"].tolist() == list(range(n))
    assert out["n_tokens"].tolist() == counts.tolist()
    assert out["pack_id"].tolist() == (excl // 100).tolist()
    # pack ids are contiguous from 0
    assert out["pack_id"].min() == 0
    assert set(np.diff(sorted(out["pack_id"].unique()))) <= {1}


def test_pack_sequences_sparse_ids(ray_session):
    """Ids need not be dense — packing follows id ORDER, not position."""
    import ray.data as rd

    from gliner_cpp_ray.stages.packing import pack_sequences

    ids = [5, 1000, 7, 99999, 42]
    nt = [60, 60, 60, 60, 60]
    df = pd.DataFrame({"doc_id": ids, "n_tokens": nt})
    out = (
        pack_sequences(rd.from_pandas(df), budget=100, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    # sorted-id order: 5,7,42,1000,99999 -> prior sums 0,60,120,180,240
    assert out["pack_id"].tolist() == [0, 0, 1, 1, 2]


def test_global_shuffle_positions(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.packing import global_shuffle_positions

    n = 200
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "v": np.arange(n) * 7})
    out1 = (
        global_shuffle_positions(rd.from_pandas(df).repartition(4), n_buckets=9)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # expected rank from the same hash order, computed directly
    order = sorted(
        range(n),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest()[:16], i),
    )
    exp_pos = np.empty(n, np.int64)
    exp_pos[order] = np.arange(n)
    assert out1["pos"].tolist() == exp_pos.tolist()
    assert out1["v"].tolist() == (out1["doc_id"] * 7).tolist()  # payload carried
    # partitioning-invariant
    out2 = (
        global_shuffle_positions(rd.from_pandas(df).repartition(11), n_buckets=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out2["pos"].tolist() == out1["pos"].tolist()
    # a permutation: every position exactly once
    assert sorted(out1["pos"]) == list(range(n))


def test_weighted_sample_matches_reference(ray_session):
    """Each probe lands on the doc whose cumulative-weight interval
    contains it; zero-weight docs are never drawn; the result is
    invariant to input partitioning."""
    import ray.data as rd

    from gliner_cpp_ray.stages.sampling import (
        probe_positions,
        weighted_sample_with_replacement,
    )

    rng = np.random.default_rng(5)
    n = 200
    w = rng.integers(0, 50, n).astype(np.int64)  # some zero weights
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "w": w})

    out = (
        weighted_sample_with_replacement(
            rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(6),
            "doc_id", "w", m=100, n_buckets=9,
        )
        .to_pandas()
        .sort_values("sample_id")
        .reset_index(drop=True)
    )
    # closed-form reference: searchsorted over the inclusive cumsum
    cum = w.cumsum()
    pos = probe_positions(100, int(cum[-1]))
    want = np.searchsorted(cum, pos, side="right")
    assert out["sample_id"].tolist() == list(range(100))
    assert out["doc_id"].tolist() == want.tolist()
    assert not set(out["doc_id"]) & set(np.flatnonzero(w == 0))

    # partitioning invariance
    out2 = (
        weighted_sample_with_replacement(
            rd.from_pandas(df).repartition(2), "doc_id", "w",
            m=100, n_buckets=3,
        )
        .to_pandas()
        .sort_values("sample_id")
        .reset_index(drop=True)
    )
    assert out2["doc_id"].tolist() == out["doc_id"].tolist()


def test_weighted_sample_empty_and_zero_mass(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.sampling import (
        weighted_sample_with_replacement,
    )

    df = pd.DataFrame({"doc_id": [1, 2], "w": [0, 0]})
    out = weighted_sample_with_replacement(
        rd.from_pandas(df), "doc_id", "w", m=8
    ).to_pandas()
    assert len(out) == 0
