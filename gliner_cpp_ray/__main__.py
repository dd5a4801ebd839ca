"""CLI driver (reference examples A16 re-expressed for Ray Data).

    python -m gliner_cpp_ray inference --text "Kyiv is the capital of
        Ukraine." --entities city country   # single-text demo
    python -m gliner_cpp_ray kg --pages <dir> --out <dir>   # full KG run
    python -m gliner_cpp_ray run --input <parquet> --output <dir> \
        --config pipeline.json               # config-driven pipeline
    python -m gliner_cpp_ray stages          # list registered stages

Owns its Ray session (guarded init; the library itself never inits).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None) -> bool:
    """Guarded init; returns True iff this process owns the session (and
    should shut it down) — never tears down a caller-provided session."""
    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return owns


def cmd_inference(args) -> int:
    from gliner_cpp_ray.config import GlinerConfig, SPAN_LEVEL, TOKEN_LEVEL
    from gliner_cpp_ray.core.model import GazetteerScoringModel, GlinerModel, OnnxScoringModel
    from gliner_cpp_ray.core.subword import HashSubwordTokenizer, HFSubwordTokenizer
    from gliner_cpp_ray.sources import world

    model_type = TOKEN_LEVEL if args.token_level else SPAN_LEVEL
    cfg = GlinerConfig(max_width=args.max_width, model_type=model_type)
    if args.onnx:
        scoring = OnnxScoringModel(args.onnx, model_type, device_id=args.device)
        subword = HFSubwordTokenizer(args.tokenizer)
    else:
        scoring = GazetteerScoringModel(world.ner_gazetteer())
        subword = HashSubwordTokenizer()
    model = GlinerModel(scoring, cfg, subword)
    for doc_spans in model.inference([args.text], args.entities, threshold=args.threshold):
        for s in doc_spans:
            print(f"[{s.start}, {s.end}] {s.text!r} => {s.label} ({s.prob:.3f})")
    return 0


def cmd_kg(args) -> int:
    owns = _ray_session(args.num_cpus)
    from gliner_cpp_ray.pipelines.kg import (
        KGPipelineConfig,
        run_kg_delta,
        run_kg_pipeline,
    )

    if not args.pages and not args.delta:
        print("kg: one of --pages (full run) or --delta (ingest) is required")
        return 2
    cfg = KGPipelineConfig(shards=args.shards)
    if args.delta:
        # incremental ingest: NER over the new batch only; the wide
        # downstream stages recompute via their lineage-keyed checkpoints
        summary = run_kg_delta(args.delta, args.out, cfg)
    else:
        summary = run_kg_pipeline(args.pages, args.out, cfg)
    print(json.dumps(summary, indent=1, default=str))
    if owns:
        import ray

        ray.shutdown()
    return 0


def cmd_run(args) -> int:
    owns = _ray_session(args.num_cpus)
    import ray.data as rd

    from gliner_cpp_ray.pipelines.registry import build_pipeline

    with open(args.config) as f:
        config = json.load(f)
    ds = rd.read_parquet(args.input)
    out = build_pipeline(ds, config)
    out.write_parquet(args.output)
    print(f"wrote {args.output}")
    if owns:
        import ray

        ray.shutdown()
    return 0


def cmd_stages(_args) -> int:
    from gliner_cpp_ray.pipelines.registry import registered_stages

    print("\n".join(registered_stages()))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gliner_cpp_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("inference", help="single-text NER demo")
    pi.add_argument("--text", required=True)
    pi.add_argument("--entities", nargs="+", required=True)
    pi.add_argument("--threshold", type=float, default=0.5)
    pi.add_argument("--max-width", type=int, default=12)
    pi.add_argument("--token-level", action="store_true")
    pi.add_argument("--onnx", help="path to model.onnx (real GLiNER weights)")
    pi.add_argument("--tokenizer", help="path to tokenizer.json")
    pi.add_argument(
        "--device", type=int, default=-1,
        help="CUDA device id for the ONNX session; -1 = CPU "
             "(reference inference_gpu.cpp / model.cpp:71-77)",
    )
    pi.set_defaults(fn=cmd_inference)

    pk = sub.add_parser(
        "kg", help="run the full KG pipeline (or ingest a delta batch)"
    )
    pk.add_argument("--pages", required=False, default=None)
    pk.add_argument(
        "--delta",
        default=None,
        help="pages dir/file of a NEW crawl batch to merge into an "
        "existing --out (runs NER over the batch only)",
    )
    pk.add_argument("--out", required=True)
    pk.add_argument("--shards", type=int, default=2)
    pk.add_argument("--num-cpus", type=int, default=None)
    pk.set_defaults(fn=cmd_kg)

    pr = sub.add_parser("run", help="run a config-driven pipeline")
    pr.add_argument("--input", required=True)
    pr.add_argument("--output", required=True)
    pr.add_argument("--config", required=True)
    pr.add_argument("--num-cpus", type=int, default=None)
    pr.set_defaults(fn=cmd_run)

    ps = sub.add_parser("stages", help="list registered pipeline stages")
    ps.set_defaults(fn=cmd_stages)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
