"""``ray job submit``-compatible CLI (north-rule operational surface):

    ray job submit -- python -m fuzzy_matcher_ray dedup \
        --input /data/pages.parquet --output /data/run1/clusters \
        --checkpoint /data/run1/ck --source webpages

Subcommands map 1:1 onto the library pipelines; the process owns the Ray
session (the library never calls ray.init). Each run prints ONE JSON line
of metrics (rows, wall, docs/sec) to stdout for job-log scraping.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:                      # on a real cluster leave unset —
            kwargs["num_cpus"] = num_cpus  # the cluster defines resources
        ray.init(address="local" if num_cpus else None, **kwargs)
    import logging

    from ray.data import DataContext
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    DataContext.get_current().enable_progress_bars = False


def _source(kind: str, path: str):
    from fuzzy_matcher_ray.sources.protocol import (documents_source,
                                                    webpages_source)
    if kind == "webpages":
        return webpages_source(path)
    if kind == "webpages-html":
        # raw crawl: derive text from the html column via the extraction
        # actor pool (byte-identical to the pre-extracted mode)
        return webpages_source(path, extract_html=True)
    if kind == "documents":
        return documents_source(path)
    raise SystemExit(
        f"unknown --source {kind!r} (webpages|webpages-html|documents)")


_VALID_PASSES = ("exact", "minhash", "simhash", "substring")


def _rows_written(path: str) -> int:
    """Row count from the parquet files just written (metadata read) —
    never re-executes the lazy pipeline that produced them."""
    import ray.data as rd
    return rd.read_parquet(path).count()


def cmd_dedup(args) -> dict:
    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.pipelines.dedup import find_duplicates
    from fuzzy_matcher_ray.state.checkpoint import Checkpointer, write_atomic

    passes = tuple(p.strip() for p in args.passes.split(",") if p.strip())
    bad = [p for p in passes if p not in _VALID_PASSES]
    if bad or not passes:
        raise SystemExit(f"--passes: unknown pass(es) {bad or ['<empty>']}; "
                         f"valid: {','.join(_VALID_PASSES)}")
    cfg = PipelineConfig()
    # lineage key = config x input x passes: a checkpoint dir reused with a
    # different input OR pass set must rebuild, not silently resume the old
    # run's edge union / clusters
    ck = (Checkpointer(args.checkpoint,
                       f"{cfg.config_hash()}:{args.source}:{args.input}:"
                       + ",".join(sorted(passes)))
          if args.checkpoint else None)
    docs = _source(args.source, args.input)
    t0 = time.perf_counter()
    out = find_duplicates(docs, cfg, checkpointer=ck, passes=passes)
    write_atomic(out, args.output)
    wall = time.perf_counter() - t0
    n = _rows_written(args.output)
    return {"job": "dedup", "rows": n, "sec": round(wall, 3),
            "docs_per_sec": round(n / wall, 1) if wall else None,
            "passes": list(passes), "output": args.output,
            "resumed_stages": [s for s, m in ck.metrics.items()
                               if m.get("resumed")] if ck else []}


def cmd_dedup_sharded(args) -> dict:
    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.pipelines.dedup import dedup_sharded
    from fuzzy_matcher_ray.state.checkpoint import write_atomic

    passes = tuple(p.strip() for p in args.passes.split(",") if p.strip())
    bad = [p for p in passes if p not in _VALID_PASSES]
    if bad or not passes:
        raise SystemExit(f"--passes: unknown pass(es) {bad or ['<empty>']}; "
                         f"valid: {','.join(_VALID_PASSES)}")
    paths = [p.strip() for p in args.inputs.split(",") if p.strip()]
    if not paths:
        raise SystemExit("--inputs: need >=1 comma-separated parquet paths")
    # the full path is the shard's lineage label; factories keep skipped
    # shards unread on resume
    shards = [(p, (lambda p=p: _source(args.source, p))) for p in paths]
    cfg = PipelineConfig()
    t0 = time.perf_counter()
    out = dedup_sharded(shards, args.state, cfg, passes=passes,
                        prune=not args.no_prune)
    write_atomic(out, args.output)
    wall = time.perf_counter() - t0
    n = _rows_written(args.output)
    return {"job": "dedup_sharded", "rows": n, "sec": round(wall, 3),
            "docs_per_sec": round(n / wall, 1) if wall else None,
            "shards": len(paths), "passes": list(passes),
            "state": args.state, "output": args.output}


def cmd_span_dedup(args) -> dict:
    from fuzzy_matcher_ray.pipelines.webtext import dedup_spans, line_dedup
    from fuzzy_matcher_ray.state.checkpoint import write_atomic

    docs = _source(args.source, args.input).select_columns(
        ["doc_id", "text"])
    t0 = time.perf_counter()
    out = (line_dedup(docs) if args.mode == "line"
           else dedup_spans(docs, span_tokens=args.span_tokens))
    write_atomic(out, args.output)
    wall = time.perf_counter() - t0
    n = _rows_written(args.output)
    return {"job": f"{args.mode}_dedup", "rows": n, "sec": round(wall, 3),
            "output": args.output}


def cmd_curate(args) -> dict:
    """The composed curation recipe as one resumable job: quality →
    exact+near dedup → decontaminate → ccnet keep → mix → pack."""
    from fuzzy_matcher_ray.pipelines.curate import curate_corpus
    from fuzzy_matcher_ray.state.checkpoint import write_atomic

    t0 = time.perf_counter()
    out = curate_corpus(args.sf_dir, checkpoint_root=args.checkpoint,
                        window=args.window, keep_buckets=args.keep_buckets,
                        neardup=args.neardup,
                        representative=args.representative)
    write_atomic(out, args.output)
    wall = time.perf_counter() - t0
    n = _rows_written(args.output)
    res = {"job": "curate", "rows": n, "sec": round(wall, 3),
           "neardup": args.neardup, "output": args.output}
    if args.checkpoint:
        import json as _json
        import os as _os
        funnel = {}
        for stage in ("s1_quality", "s2_exact", "s3_neardup", "s4_decontam",
                      "s5_ccnet", "s6_mix", "s7_packed"):
            m = _os.path.join(args.checkpoint, stage, "_MANIFEST.json")
            if _os.path.isfile(m):
                with open(m) as f:
                    funnel[stage] = _json.load(f).get("rows")
        res["funnel"] = funnel
    return res


def cmd_url_dedup(args) -> dict:
    from fuzzy_matcher_ray.pipelines.webtext import dedup_by_url
    from fuzzy_matcher_ray.state.checkpoint import write_atomic

    docs = _source(args.source, args.input)
    t0 = time.perf_counter()
    out = dedup_by_url(docs)
    write_atomic(out, args.output)
    wall = time.perf_counter() - t0
    n = _rows_written(args.output)
    return {"job": "url_dedup", "rows": n, "sec": round(wall, 3),
            "output": args.output}


def _query_registry():
    """The ``queries()`` mapping from the repo-root ``__ray_entry__.py`` —
    the driver-contract file IS the registry (one source of truth: every
    operator exposed there is runnable as a ray job). Located relative to
    the package (repo layout); clear error when absent."""
    import importlib.util
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "__ray_entry__.py")
    if not os.path.isfile(path):
        raise SystemExit(f"query registry not found at {path} "
                         "(run from the repo layout)")
    spec = importlib.util.spec_from_file_location("_fmr_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.queries()


def cmd_query(args) -> dict:
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fuzzy_matcher_ray.state.checkpoint import write_atomic

    reg = _query_registry()
    if args.list:
        return {"job": "query", "available": sorted(reg)}
    if args.name not in reg:
        raise SystemExit(f"unknown query {args.name!r}; run with --list")
    t0 = time.perf_counter()
    res = reg[args.name](args.sf_dir)
    if isinstance(res, pd.DataFrame):
        res = rd.from_pandas(res)
    elif isinstance(res, pa.Table):
        res = rd.from_arrow(res)
    write_atomic(res, args.output)
    wall = time.perf_counter() - t0
    n = _rows_written(args.output)
    return {"job": f"query:{args.name}", "rows": n, "sec": round(wall, 3),
            "output": args.output}


def cmd_report(args) -> dict:
    """Lineage + metrics over a checkpoint root (per-stage manifests)."""
    from fuzzy_matcher_ray.state.checkpoint import run_report
    t = run_report(args.state_root)
    d = t.to_pydict()
    stages = [
        {"path": p_, "stage": s, "rows": r, "wall_sec": w,
         "resumed": rs, "pruned": pr, "n_files": nf, "data_bytes": b}
        for p_, s, r, w, rs, pr, nf, b in zip(
            d["path"], d["stage"], d["rows"], d["wall_sec"], d["resumed"],
            d["pruned"], d["n_files"], d["data_bytes"])]
    return {"job": "report", "state_root": args.state_root,
            "n_stages": len(stages),
            "total_wall_sec": round(sum(max(s["wall_sec"], 0.0)
                                        for s in stages), 3),
            "total_bytes": sum(s["data_bytes"] for s in stages),
            "stages": stages}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="python -m fuzzy_matcher_ray")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local-mode CPU cap; omit on a real cluster")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="flagship near-dup clustering")
    d.add_argument("--input", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--checkpoint", default=None)
    d.add_argument("--source", default="webpages")
    d.add_argument("--passes", default="exact,minhash,simhash,substring")
    d.set_defaults(fn=cmd_dedup)

    ds_ = sub.add_parser(
        "dedup-sharded",
        help="resumable multi-shard near-dup clustering (fold chain)")
    ds_.add_argument("--inputs", required=True,
                     help="comma-separated shard parquet paths, in order")
    ds_.add_argument("--output", required=True)
    ds_.add_argument("--state", required=True,
                     help="checkpoint root (per-shard lineage lives here)")
    ds_.add_argument("--source", default="webpages")
    ds_.add_argument("--passes", default="exact,minhash,simhash,substring")
    ds_.add_argument("--no-prune", action="store_true",
                     help="keep every fold's clusters data (debugging)")
    ds_.set_defaults(fn=cmd_dedup_sharded)

    s = sub.add_parser("span-dedup", help="sub-document span/line dedup")
    s.add_argument("--input", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--source", default="webpages")
    s.add_argument("--mode", choices=["span", "line"], default="span")
    s.add_argument("--span-tokens", type=int, default=10)
    s.set_defaults(fn=cmd_span_dedup)

    u = sub.add_parser("url-dedup", help="canonical-URL re-crawl collapse")
    u.add_argument("--input", required=True)
    u.add_argument("--output", required=True)
    u.add_argument("--source", default="webpages")
    u.set_defaults(fn=cmd_url_dedup)

    q = sub.add_parser(
        "query",
        help="run any registered operator query over an sf-style table dir")
    q.add_argument("--name", default=None,
                   help="query name (see --list)")
    q.add_argument("--sf-dir", default=None,
                   help="directory holding the parquet tables")
    q.add_argument("--output", default=None)
    q.add_argument("--list", action="store_true",
                   help="print available query names and exit")
    q.set_defaults(fn=cmd_query)

    r = sub.add_parser(
        "report",
        help="print per-stage lineage + metrics for a checkpoint root")
    r.add_argument("--state-root", required=True)
    r.set_defaults(fn=cmd_report)

    c = sub.add_parser(
        "curate",
        help="composed curation chain: quality → exact+near dedup → "
             "decontaminate → ccnet keep → mix → pack (resumable)")
    c.add_argument("--sf-dir", required=True,
                   help="directory holding documents.parquet")
    c.add_argument("--output", required=True)
    c.add_argument("--checkpoint", default=None,
                   help="stage-artifact root; rerun with the same root "
                        "resumes from the last completed stage")
    c.add_argument("--neardup", choices=["lsh", "exact"], default="lsh")
    c.add_argument("--representative", choices=["min", "best"],
                   default="min",
                   help="dup-cluster member to keep: lowest doc_id (the "
                        "contract convention) or the longest raw text")
    c.add_argument("--window", type=int, default=64)
    c.add_argument("--keep-buckets", type=int, default=2)
    c.set_defaults(fn=cmd_curate)

    args = p.parse_args(argv)
    if getattr(args, "fn", None) is cmd_query and not args.list:
        missing = [f for f in ("name", "sf_dir", "output")
                   if not getattr(args, f)]
        if missing:
            raise SystemExit(
                f"query: missing {', '.join('--' + m.replace('_', '-') for m in missing)}")
    _init_ray(args.num_cpus)
    try:
        print(json.dumps(args.fn(args)))
    finally:
        import ray
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
