"""Sharded fold-chain dedup (dedup_sharded): the operational shape of a
10^12-doc run. Parity with a monolithic find_duplicates over the shard
concatenation; resume skips finished folds without reading their data;
pruning keeps exactly one live clusters snapshot; empty shards fold."""

import json
import os

import pyarrow as pa

from fuzzy_matcher_ray.config import PipelineConfig
from fuzzy_matcher_ray.sources.webpages import make_webpages


def _docs_tbl(n, seed, id_offset=0):
    pages, _ = make_webpages(n, seed=seed)
    return pa.table({
        "doc_id": pa.array(range(id_offset, id_offset + len(pages)),
                           pa.int64()),
        "url": pages["url"], "text": pages["text"], "lang": pages["lang"]})


def _labels(ds):
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df[["doc_id", "cluster_id"]]


def test_sharded_matches_monolithic(ray_session, tmp_path):
    """3-shard fold == find_duplicates over the concatenation, byte-equal."""
    import ray.data as rd
    from fuzzy_matcher_ray.pipelines.dedup import dedup_sharded, find_duplicates

    cfg = PipelineConfig()
    tbls = [_docs_tbl(300, seed=61, id_offset=0),
            _docs_tbl(200, seed=62, id_offset=1_000_000),
            _docs_tbl(150, seed=63, id_offset=2_000_000)]
    shards = [(f"s{i}", rd.from_arrow(t)) for i, t in enumerate(tbls)]
    root = str(tmp_path / "state")

    got = _labels(dedup_sharded(shards, root, cfg))
    want = _labels(find_duplicates(rd.from_arrow(pa.concat_tables(tbls)),
                                   cfg))
    assert len(got) == 650
    assert got.equals(want)

    # pruning: only the LAST fold's clusters data survives; earlier folds
    # keep a lineage manifest flagged pruned
    sroots = sorted(os.listdir(root))
    assert len(sroots) == 3
    for i, sr in enumerate(sroots):
        data = os.path.join(root, sr, "clusters", "data")
        manifest = os.path.join(root, sr, "clusters", "_MANIFEST.json")
        with open(manifest) as f:
            m = json.load(f)
        if i < 2:
            assert not os.path.isdir(data), sr
            assert m["pruned"] is True
        else:
            assert os.path.isdir(data), sr
            assert not m.get("pruned")
        # per-partition lineage + metrics survive on every fold
        assert m["rows"] >= 0 and "wall_sec" in m


def test_sharded_resume_skips_finished_folds(ray_session, tmp_path):
    """Re-run with the same labels: finished shards are never evaluated
    (a poisoned factory proves it), output unchanged; appending a 3rd
    shard folds only the increment."""
    import ray.data as rd
    from fuzzy_matcher_ray.pipelines.dedup import dedup_sharded, find_duplicates

    cfg = PipelineConfig()
    t0 = _docs_tbl(250, seed=71, id_offset=0)
    t1 = _docs_tbl(120, seed=72, id_offset=1_000_000)
    t2 = _docs_tbl(100, seed=73, id_offset=2_000_000)
    root = str(tmp_path / "state")

    first = _labels(dedup_sharded(
        [("a", rd.from_arrow(t0)), ("b", rd.from_arrow(t1))], root, cfg))

    def _boom():
        raise AssertionError("finished shard was re-evaluated")

    again = _labels(dedup_sharded([("a", _boom), ("b", _boom)], root, cfg))
    assert again.equals(first)

    # append-only growth: fold the new shard against the existing chain
    grown = _labels(dedup_sharded(
        [("a", _boom), ("b", _boom), ("c", rd.from_arrow(t2))], root, cfg))
    want = _labels(find_duplicates(
        rd.from_arrow(pa.concat_tables([t0, t1, t2])), cfg))
    assert grown.equals(want)


def test_sharded_empty_shards(ray_session, tmp_path):
    """Empty first shard and empty middle shard both fold into valid chain
    links; result matches the monolithic run over the non-empty docs."""
    import ray.data as rd
    from fuzzy_matcher_ray.pipelines.dedup import dedup_sharded, find_duplicates

    cfg = PipelineConfig()
    t_mid = _docs_tbl(180, seed=81, id_offset=0)
    t_last = _docs_tbl(90, seed=82, id_offset=1_000_000)
    empty = _docs_tbl(0, seed=83)
    root = str(tmp_path / "state")

    got = _labels(dedup_sharded(
        [("e0", rd.from_arrow(empty)), ("m", rd.from_arrow(t_mid)),
         ("e1", rd.from_arrow(empty)), ("z", rd.from_arrow(t_last))],
        root, cfg))
    want = _labels(find_duplicates(
        rd.from_arrow(pa.concat_tables([t_mid, t_last])), cfg))
    assert got.equals(want)


def test_sharded_guards(ray_session, tmp_path):
    import pytest
    import ray.data as rd
    from fuzzy_matcher_ray.pipelines.dedup import dedup_sharded

    with pytest.raises(ValueError, match="no shards"):
        dedup_sharded([], str(tmp_path / "s1"))
    t = rd.from_arrow(_docs_tbl(5, seed=91))
    with pytest.raises(ValueError, match="unique"):
        dedup_sharded([("x", t), ("x", t)], str(tmp_path / "s2"))


def test_sharded_cli(tmp_path):
    """dedup-sharded CLI (subprocess — the CLI owns its Ray session): two
    shard files, resumable state, atomic output."""
    import subprocess
    import sys

    import pyarrow.parquet as pq

    # split ONE crawl fixture into two row-ranges: shard urls (→ surrogate
    # doc_ids) are disjoint by construction, like real crawl segments
    pages, _ = make_webpages(230, seed=95)
    p0 = str(tmp_path / "shard0.parquet")
    p1 = str(tmp_path / "shard1.parquet")
    pq.write_table(pages.slice(0, 150), p0)
    pq.write_table(pages.slice(150), p1)
    out = str(tmp_path / "out")
    args = [sys.executable, "-m", "fuzzy_matcher_ray", "--num-cpus", "2",
            "dedup-sharded", "--inputs", f"{p0},{p1}", "--output", out,
            "--state", str(tmp_path / "state"),
            "--passes", "exact,minhash"]
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(args, capture_output=True, text=True, timeout=600,
                          cwd=cwd)
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = json.loads([ln for ln in proc.stdout.splitlines()
                    if ln.startswith("{")][0])
    assert m["job"] == "dedup_sharded" and m["rows"] == 230
    assert pq.read_table(out).num_rows == 230
    # rerun resumes: same rows, no append-doubling
    proc = subprocess.run(args, capture_output=True, text=True, timeout=600,
                          cwd=cwd)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert pq.read_table(out).num_rows == 230


def test_sharded_truncated_shard_list_fails_with_intent(ray_session,
                                                        tmp_path):
    """Re-running against a longer completed chain's state_root with a
    TRUNCATED shard list must raise the explanatory ValueError, not an
    opaque missing-parquet read error (round-3 advice item)."""
    import pytest
    import ray.data as rd
    from fuzzy_matcher_ray.pipelines.dedup import dedup_sharded

    cfg = PipelineConfig()
    tbls = [_docs_tbl(120, seed=71, id_offset=0),
            _docs_tbl(100, seed=72, id_offset=1_000_000),
            _docs_tbl(80, seed=73, id_offset=2_000_000)]
    shards = [(f"s{i}", rd.from_arrow(t)) for i, t in enumerate(tbls)]
    root = str(tmp_path / "state")
    dedup_sharded(shards, root, cfg).materialize()
    with pytest.raises(ValueError, match="LONGER completed"):
        dedup_sharded(shards[:2], root, cfg)


def test_prebuild_artifacts_resumed_by_fold(ray_session, tmp_path):
    """_prebuild_increment writes normalize/signatures/winnow_rows that the
    fold's own ck.stage calls RESUME (manifest hit, no rebuild), and the
    fold output is byte-identical to a fold without any prebuild."""
    import ray.data as rd
    from fuzzy_matcher_ray.pipelines.dedup import (
        _prebuild_increment, find_duplicates, incremental_update)
    from fuzzy_matcher_ray.state.checkpoint import Checkpointer

    cfg = PipelineConfig()
    passes = ("exact", "minhash", "simhash", "substring")
    base = _docs_tbl(300, seed=71, id_offset=0)
    inc = _docs_tbl(150, seed=72, id_offset=1_000_000)

    root0 = str(tmp_path / "s0")
    key = cfg.config_hash() + ":t"
    find_duplicates(rd.from_arrow(base), cfg,
                    checkpointer=Checkpointer(root0, key), passes=passes)

    # fold WITHOUT prebuild
    root_a = str(tmp_path / "inc_plain")
    out_a = _labels(incremental_update(
        [root0], rd.from_arrow(inc), cfg, passes=passes,
        checkpointer=Checkpointer(root_a, key)))

    # prebuild first, then fold: every prebuilt stage must resume
    root_b = str(tmp_path / "inc_pre")
    box = {}
    _prebuild_increment(root_b, key, rd.from_arrow(inc), cfg, passes, box)
    assert box["data"] is not None
    for stage in ("normalize", "signatures", "winnow_rows"):
        assert os.path.isfile(os.path.join(root_b, stage, "_MANIFEST.json"))
    ck_b = Checkpointer(root_b, key)
    out_b = _labels(incremental_update(
        [root0], box["data"], cfg, passes=passes, checkpointer=ck_b))
    for stage in ("normalize", "signatures", "winnow_rows"):
        assert ck_b.metrics.get(stage, {}).get("resumed") is True, stage
    assert out_a.equals(out_b)


def test_sharded_touched_only_relabel_parity(ray_session, tmp_path,
                                             monkeypatch):
    """The chain with the touched-component relabel forced on every fold
    (FMR_INC_TOUCHED_MIN_PRIOR=0 — the path a 10^12-doc chain takes, where
    the prior corpus is far past the gate) stays byte-identical to the
    monolithic run, with planted cross-shard duplicates so folds really
    rewire prior components."""
    import ray.data as rd
    from fuzzy_matcher_ray.pipelines.dedup import (dedup_sharded,
                                                   find_duplicates)

    t0 = _docs_tbl(300, seed=71, id_offset=0)
    t1 = _docs_tbl(200, seed=72, id_offset=1_000_000)
    # shard 2 = fresh docs + verbatim copies of 25 shard-0 texts
    fresh = _docs_tbl(100, seed=73, id_offset=2_000_000)
    copies = t0.slice(0, 25)
    t2 = pa.table({
        "doc_id": pa.array(list(fresh["doc_id"].to_pylist())
                           + list(range(3_000_000, 3_000_025)), pa.int64()),
        "url": pa.array(fresh["url"].to_pylist()
                        + [f"https://copy.example/{i}" for i in range(25)]),
        "text": pa.array(fresh["text"].to_pylist()
                         + copies["text"].to_pylist()),
        "lang": pa.array(fresh["lang"].to_pylist()
                         + copies["lang"].to_pylist())})
    tbls = [t0, t1, t2]
    cfg = PipelineConfig()

    monkeypatch.setenv("FMR_INC_TOUCHED_MIN_PRIOR", "0")
    shards = [(f"s{i}", rd.from_arrow(t)) for i, t in enumerate(tbls)]
    got = _labels(dedup_sharded(shards, str(tmp_path / "state"), cfg))
    monkeypatch.delenv("FMR_INC_TOUCHED_MIN_PRIOR")
    want = _labels(find_duplicates(rd.from_arrow(pa.concat_tables(tbls)),
                                   cfg))
    assert len(got) == 625
    assert got.equals(want)
    # the planted copies really landed in shard-0 components
    m = dict(zip(want["doc_id"], want["cluster_id"]))
    assert any(m[3_000_000 + i] == m[t0["doc_id"][i].as_py()]
               for i in range(25))
