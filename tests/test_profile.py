"""table_profile: per-column stats as one mergeable aggregate."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gliner_cpp_ray.stages.profile import table_profile


def test_profile_int_and_float_with_nulls(ray_session):
    t = pa.table(
        {
            "i": pa.array([5, None, -3, 7], pa.int64()),
            "f": pa.array([1.25, 0.5, None, None], pa.float64()),
        }
    )
    got = {
        r["column"]: r
        for r in table_profile(rd.from_arrow(t), ["i", "f"]).take_all()
    }
    assert got["i"]["n_rows"] == 4 and got["i"]["n_nulls"] == 1
    assert got["i"]["min_v"] == -3 and got["i"]["max_v"] == 7
    assert got["f"]["n_nulls"] == 2
    assert got["f"]["min_v"] == 500_000 and got["f"]["max_v"] == 1_250_000


def test_profile_all_null_column_keeps_sentinels(ray_session):
    t = pa.table({"x": pa.array([None, None], pa.float64())})
    (row,) = table_profile(rd.from_arrow(t), ["x"]).take_all()
    assert row["n_nulls"] == row["n_rows"] == 2
    assert row["min_v"] == np.iinfo(np.int64).max
    assert row["max_v"] == np.iinfo(np.int64).min


def test_profile_rejects_empty_cols(ray_session):
    t = pa.table({"x": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        table_profile(rd.from_arrow(t), [])
