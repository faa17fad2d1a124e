"""CLI smoke tests (``python -m fuzzy_matcher_ray``) — the north rule's
``ray job submit`` operational surface. Runs in a subprocess because the CLI
owns its own Ray session (the library never calls ray.init)."""

import json
import os
import subprocess
import sys

SF = os.environ.get("GRAFT_SF_SMOKE", "/root/testdata/sf0.001")


def _run_cli(*argv: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", "fuzzy_matcher_ray", "--num-cpus", "2", *argv],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    # metrics are the ONE JSON line on stdout (job-log scraping contract)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, proc.stdout[-2000:]
    return json.loads(lines[0])


def test_cli_url_dedup(tmp_path):
    m = _run_cli("url-dedup", "--input", SF, "--source", "documents",
                 "--output", str(tmp_path / "out"))
    assert m["job"] == "url_dedup" and m["rows"] > 0
    assert (tmp_path / "out").is_dir()


def test_cli_dedup_fresh_then_resume(tmp_path):
    args = ("dedup", "--input", SF, "--source", "documents",
            "--checkpoint", str(tmp_path / "ck"),
            "--output", str(tmp_path / "clusters"))
    m1 = _run_cli(*args)
    assert m1["rows"] > 0 and m1["resumed_stages"] == []
    # rerun: resumes every stage AND the atomic output write does not
    # append-double the parquet dir
    m2 = _run_cli(*args)
    assert m2["rows"] == m1["rows"]
    assert "clusters" in m2["resumed_stages"]
    # a different pass set must invalidate the lineage, not silently
    # resume the previous run's edge union
    m3 = _run_cli(*args, "--passes", "exact")
    assert m3["resumed_stages"] == [] and m3["rows"] == m1["rows"]


def test_cli_rejects_unknown_pass(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "fuzzy_matcher_ray", "--num-cpus", "2",
         "dedup", "--input", SF, "--source", "documents",
         "--passes", "exact,minash", "--output", str(tmp_path / "o")],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode != 0
    assert "minash" in proc.stderr


def test_cli_query_list_and_run(tmp_path):
    m = _run_cli("query", "--list")
    names = m["available"]
    assert "host_stats" in names and "dedup_full" in names
    assert len(names) >= 60

    out = str(tmp_path / "qout")
    m2 = _run_cli("query", "--name", "host_stats",
                  "--sf-dir", SF, "--output", out)
    assert m2["job"] == "query:host_stats" and m2["rows"] > 0
    import duckdb
    n = duckdb.sql(f"select count(*) from '{out}/**/*.parquet'").fetchone()[0]
    assert n == m2["rows"]


def test_cli_query_unknown_name(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "fuzzy_matcher_ray", "--num-cpus", "2",
         "query", "--name", "nope", "--sf-dir", SF,
         "--output", str(tmp_path / "o")],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode != 0
    assert "unknown query" in proc.stderr


def test_cli_report(ray_session, tmp_path):
    """`report --state-root` prints per-stage lineage + metrics JSON."""
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import ray.data as rd
    from fuzzy_matcher_ray.config import PipelineConfig
    from fuzzy_matcher_ray.pipelines.dedup import find_duplicates
    from fuzzy_matcher_ray.sources.webpages import make_webpages
    from fuzzy_matcher_ray.state.checkpoint import Checkpointer

    pages, _ = make_webpages(120, seed=97)
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(pages)), pa.int64()),
        "url": pages["url"], "text": pages["text"], "lang": pages["lang"]}))
    cfg = PipelineConfig()
    root = str(tmp_path / "ck")
    find_duplicates(docs, cfg,
                    checkpointer=Checkpointer(root, cfg.config_hash())) \
        .materialize()
    out = subprocess.run(
        [sys.executable, "-m", "fuzzy_matcher_ray", "--num-cpus", "2",
         "report", "--state-root", root],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert d["n_stages"] >= 3 and d["total_wall_sec"] > 0
    assert {"stage", "rows", "wall_sec", "resumed", "pruned"} <= \
        set(d["stages"][0])


def test_cli_curate_fresh_then_resume(tmp_path):
    args = ("curate", "--sf-dir", SF,
            "--checkpoint", str(tmp_path / "ck"),
            "--output", str(tmp_path / "packed"))
    m1 = _run_cli(*args)
    assert m1["job"] == "curate" and m1["rows"] > 0
    assert list(m1["funnel"]) == ["s1_quality", "s2_exact", "s3_neardup",
                                  "s4_decontam", "s5_ccnet", "s6_mix",
                                  "s7_packed"]
    assert m1["funnel"]["s7_packed"] == m1["rows"]
    m2 = _run_cli("curate", "--sf-dir", SF,
                  "--checkpoint", str(tmp_path / "ck"),
                  "--output", str(tmp_path / "packed2"))
    assert m2["rows"] == m1["rows"] and m2["funnel"] == m1["funnel"]
    assert m2["sec"] < m1["sec"]          # every stage resumed
