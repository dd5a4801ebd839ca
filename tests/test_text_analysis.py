import hashlib

import pyarrow as pa

from gliner_cpp_ray.stages.text_analysis import (
    LangId,
    fingerprints,
    quality_counts,
    token_counts,
)


def tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_counts():
    out = token_counts(tbl(["a b  c", "  x ", "", "one"]))
    assert out.column("n_tokens").to_pylist() == [3, 1, 0, 1]


def test_quality_counts():
    out = quality_counts(tbl(["The cat and 2 dogs!", ""]))
    assert out.column("n_chars").to_pylist() == [19, 0]
    assert out.column("n_alpha").to_pylist() == [13, 0]
    assert out.column("n_digit").to_pylist() == [1, 0]
    assert out.column("n_tokens").to_pylist() == [5, 0]
    assert out.column("n_stopwords").to_pylist() == [2, 0]  # "The", "and"


def test_fingerprints_md5_and_rolling():
    out = fingerprints(tbl(["hello world", "hello world", "different"]))
    md5 = out.column("content_md5").to_pylist()
    assert md5[0] == hashlib.md5(b"hello world").hexdigest()
    assert md5[0] == md5[1] and md5[0] != md5[2]
    roll = out.column("rolling_hash").to_pylist()
    assert roll[0] == roll[1] and roll[0] != roll[2]


def test_langid():
    stage = LangId()
    out = stage(
        tbl(
            [
                "the cat is on the mat and the dog is in the house",
                "der hund ist mit der katze und das haus",
                "el perro y la casa es de los gatos",
                "这 是 一个 中文 句子 关于 数据 系统 的 测试 文本 更多 中文",
            ]
        )
    )
    assert out.column("pred_lang").to_pylist() == ["en", "de", "es", "zh"]


def test_trim_definition_matches_duckdb_oracle():
    """The token/quality counters and their SQL oracles must share ONE
    trim definition (RE2 ``^\\s+|\\s+$``): tab/newline-edged text used
    to produce an extra empty token on the DuckDB ``trim()`` side."""
    import duckdb

    texts = ["\tcat dog\n", "  x ", "\n\n", "a\tb", "", " the end\t"]
    out = token_counts(tbl(texts))
    con = duckdb.connect()
    con.register("documents", tbl(texts))
    sql = con.execute(
        "WITH tt AS (SELECT doc_id, "
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS t FROM documents) "
        "SELECT CASE WHEN t = '' THEN 0 ELSE "
        "len(string_split_regex(t, '\\s+')) END AS n FROM tt ORDER BY doc_id"
    ).fetchall()
    assert out.column("n_tokens").to_pylist() == [r[0] for r in sql]
    assert out.column("n_tokens").to_pylist() == [2, 1, 0, 2, 0, 2]
    q = quality_counts(tbl(texts))
    assert q.column("n_tokens").to_pylist() == [2, 1, 0, 2, 0, 2]
    assert q.column("n_stopwords").to_pylist() == [0, 0, 0, 1, 0, 1]  # "a", "the"


def test_term_doc_frequency_counts_once_per_doc(ray_session):
    import pandas as pd
    import ray.data as rd

    from gliner_cpp_ray.stages.text_analysis import term_doc_frequency

    df = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c", "d"],
            "text": [
                "cat cat cat dog",     # cat counted ONCE here
                "cat bird",
                "Dog dog DOG",          # lowercased, once
                "   ",                  # empty after trim -> no terms
            ],
        }
    )
    out = (
        term_doc_frequency(rd.from_pandas(df).repartition(3), top_k=10)
        .to_pandas()
    )
    got = dict(zip(out["term"], out["df"]))
    assert got == {"cat": 2, "dog": 2, "bird": 1}
    # deterministic order: df desc, term asc
    assert out["term"].tolist() == ["cat", "dog", "bird"]


def test_token_rarity_hist_small(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.text_analysis import token_rarity_hist

    # corpus counts: 'a' x4 (bucket 2), 'b' x2 (bucket 1), 'c' x1 (bucket 0)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a a b c", "A a b"], pa.string()),
        }
    )
    got = (
        token_rarity_hist(rd.from_arrow(t))
        .to_pandas()
        .set_index(["doc_id", "bucket"])["n_tokens"]
        .to_dict()
    )
    assert got == {
        (1, 2): 2,  # doc1: a,a
        (1, 1): 1,  # doc1: b
        (1, 0): 1,  # doc1: c
        (2, 2): 2,  # doc2: A,a (lowercased)
        (2, 1): 1,  # doc2: b
    }


def test_token_rarity_bucket_exact_at_power_boundaries():
    # the frexp bucket must be floor(log2) exactly at and around powers
    # of two
    import numpy as np

    c = np.array([1, 2, 3, 4, 7, 8, 1023, 1024, 1025, 2**52 + 1], np.int64)
    bucket = (np.frexp(c.astype(np.float64))[1] - 1).astype(np.int64)
    want = np.array([0, 1, 1, 2, 2, 3, 9, 10, 10, 52], np.int64)
    assert (bucket == want).all()
