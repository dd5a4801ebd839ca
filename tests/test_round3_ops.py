"""Tests for the round-3 breadth operators: per-group term heavy
hitters, quantile-threshold filtering (sketch → broadcast → filter) and
semi-structured field extraction."""

import numpy as np
import pandas as pd
import pyarrow as pa

from gliner_cpp_ray.stages.semistructured import extract_int_field
from gliner_cpp_ray.stages.text_analysis import grouped_term_counts_partial


def test_grouped_term_counts_partial_counts_occurrences():
    t = pa.table(
        {
            "lang": ["en", "en", "de", "en"],
            "text": ["The the cat", "  the dog  ", "der der der", ""],
        }
    )
    out = grouped_term_counts_partial(t).to_pandas()
    got = dict(zip(zip(out["lang"], out["term"]), out["n"]))
    # lowercased, occurrence counts (not per-doc), empty text dropped
    assert got[("en", "the")] == 3
    assert got[("en", "cat")] == 1
    assert got[("en", "dog")] == 1
    assert got[("de", "der")] == 3
    assert out["n"].dtype == np.int64


def test_top_terms_per_group_e2e(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.text_analysis import top_terms_per_group

    df = pd.DataFrame(
        {
            "lang": ["en"] * 3 + ["de"] * 2,
            "text": ["a a b", "b c", "a", "x y", "y"],
        }
    )
    out = (
        top_terms_per_group(rd.from_pandas(df), k=2)
        .to_pandas()
        .sort_values(["lang", "n", "term"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    # en: a=3, b=2 (c=1 cut); de: y=2, x=1
    assert list(map(tuple, out[["lang", "term", "n"]].to_numpy())) == [
        ("de", "y", 2),
        ("de", "x", 1),
        ("en", "a", 3),
        ("en", "b", 2),
    ]


def test_extract_int_field_vectorized_nulls():
    t = pa.table(
        {
            "props": ['{"k": 42}', '{"j": 1}', '{"k":-7, "z": 0}', "", None],
        }
    )
    out = extract_int_field(t, field="k")
    assert out.column("k").to_pylist() == [42, None, -7, None, None]
    assert out.column("k").type == pa.int64()


def test_props_field_stats_e2e(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.semistructured import props_field_stats

    df = pd.DataFrame(
        {
            "event_type": ["a", "a", "b", "b", "b"],
            "props": ['{"k": 1}', '{"x": 9}', '{"k": 5}', '{"k": -2}', "{}"],
        }
    )
    out = (
        props_field_stats(rd.from_pandas(df))
        .to_pandas()
        .set_index("event_type")
    )
    assert out.loc["a", "n_rows"] == 2 and out.loc["a", "n_k"] == 1
    assert out.loc["a", "sum_k"] == 1
    assert out.loc["b", "n_rows"] == 3 and out.loc["b", "n_k"] == 2
    assert out.loc["b", "sum_k"] == 3


def test_count_above_group_quantile_exact(ray_session):
    import ray.data as rd

    from gliner_cpp_ray.stages.sketches import count_above_group_quantile

    # group g: values land in bins 0..9 (width 1); median bin of
    # [1..8] is 4 -> 4 values above.  group h: all equal -> 0 above.
    df = pd.DataFrame(
        {
            "g": ["g"] * 8 + ["h"] * 4,
            "v": [1, 2, 3, 4, 5, 6, 7, 8, 3, 3, 3, 3],
        }
    )
    out = (
        count_above_group_quantile(
            rd.from_pandas(df), "g", "v", lo=0.0, hi=10.0, n_bins=10,
            q_pct=50,
        )
        .to_pandas()
        .set_index("g")
    )
    assert out.loc["g", "q_bin"] == 4 and out.loc["g", "n_above"] == 4
    # group h has nothing above its median bin: absent from the counts
    assert "h" not in out.index
