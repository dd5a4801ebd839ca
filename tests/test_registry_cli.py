import json

import pyarrow as pa
import pytest

from gliner_cpp_ray.__main__ import main as cli_main
from gliner_cpp_ray.pipelines.registry import (
    build_pipeline,
    get_stage,
    register_stage,
    registered_stages,
)


def test_builtin_stages_registered():
    names = registered_stages()
    for expected in ["html_to_docs", "ner", "relations", "link", "token_counts"]:
        assert expected in names


def test_register_custom_and_duplicate():
    def upper(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.schema.get_field_index("text"),
            "text",
            pc.utf8_upper(batch.column("text")),
        )

    register_stage("upper_text_test", upper, batch_format="pyarrow")
    assert get_stage("upper_text_test").fn is upper
    with pytest.raises(ValueError):
        register_stage("upper_text_test", upper)


def test_build_pipeline_runs(ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [{"doc_id": i, "text": f"doc {i} has some words"} for i in range(50)]
    )
    out = build_pipeline(
        ds,
        [{"stage": "token_counts"}, ],
    ).to_pandas()
    assert set(out.columns) == {"doc_id", "n_tokens"}
    assert (out["n_tokens"] == 5).all()


def test_unknown_stage():
    with pytest.raises(KeyError):
        get_stage("no_such_stage")


def test_cli_inference(capsys):
    rc = cli_main(
        [
            "inference",
            "--text",
            "Kyiv is the capital of Ukraine.",
            "--entities",
            "city",
            "country",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "'Kyiv' => city" in out
    assert "'Ukraine' => country" in out


def test_cli_stages(capsys):
    assert cli_main(["stages"]) == 0
    assert "ner" in capsys.readouterr().out.split()


def test_cli_run_pipeline(ray_session, tmp_path):
    import pyarrow.parquet as pq

    src = tmp_path / "in.parquet"
    pq.write_table(
        pa.table({"doc_id": list(range(20)), "text": ["a b c"] * 20}), src
    )
    cfgf = tmp_path / "cfg.json"
    cfgf.write_text(json.dumps([{"stage": "token_counts"}]))
    outdir = tmp_path / "out"
    rc = cli_main(
        ["run", "--input", str(src), "--output", str(outdir), "--config", str(cfgf)]
    )
    assert rc == 0
    import pyarrow.dataset as pads

    got = pads.dataset(str(outdir)).to_table().to_pandas()
    assert len(got) == 20 and (got["n_tokens"] == 3).all()
