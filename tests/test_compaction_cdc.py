"""apply_cdc_delta: MERGE-with-tombstones semantics."""

import pyarrow as pa
import pytest
import ray.data as rd

from gliner_cpp_ray.stages.compaction import apply_cdc_delta


def _base():
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "v": pa.array([10, 20, 30], pa.int64()),
            }
        )
    )


def _delta(rows):
    k, v, op, ts = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "op": pa.array(op, pa.string()),
                "ts": pa.array(ts, pa.int64()),
            }
        )
    )


def test_cdc_upsert_delete_insert_and_latest_wins(ray_session):
    delta = _delta(
        [
            (2, 99, "upsert", 5),   # loses: older than the delete below
            (2, 0, "delete", 9),    # key 2 removed
            (3, 33, "upsert", 1),   # key 3 updated
            (4, 40, "upsert", 2),   # new key inserted
        ]
    )
    got = {
        r["k"]: r["v"]
        for r in apply_cdc_delta(
            _base(), delta, "k", ["v"], op_col="op", order_cols=["ts"]
        ).take_all()
    }
    assert got == {1: 10, 3: 33, 4: 40}


def test_cdc_delete_then_reinsert_by_later_op(ray_session):
    delta = _delta([(1, 0, "delete", 1), (1, 11, "upsert", 2)])
    got = {
        r["k"]: r["v"]
        for r in apply_cdc_delta(
            _base(), delta, "k", ["v"], op_col="op", order_cols=["ts"]
        ).take_all()
    }
    assert got == {1: 11, 2: 20, 3: 30}


def test_cdc_duplicate_base_keys_raise(ray_session):
    dup = rd.from_arrow(
        pa.table(
            {"k": pa.array([1, 1], pa.int64()), "v": pa.array([1, 2], pa.int64())}
        )
    )
    with pytest.raises(Exception, match="duplicate"):
        apply_cdc_delta(
            dup, _delta([(1, 9, "upsert", 1)]), "k", ["v"],
            op_col="op", order_cols=["ts"],
        ).take_all()


def test_cdc_rejects_empty_op_strings(ray_session):
    with pytest.raises(Exception, match="non-empty"):
        apply_cdc_delta(
            _base(), _delta([(1, 9, "", 1)]), "k", ["v"],
            op_col="op", order_cols=["ts"],
        ).take_all()
