"""Checkpoint/resume tests (FIXTURES.md F5): identical output after resume,
completed stages not recomputed, config change invalidates manifests."""

import json
import os
import shutil

import pyarrow as pa
import pytest

from fuzzy_matcher_ray.config import PipelineConfig
from fuzzy_matcher_ray.sources.webpages import make_webpages
from fuzzy_matcher_ray.state.checkpoint import Checkpointer

N_DOCS = 300


@pytest.fixture()
def docs(ray_session):
    import ray.data as rd
    pages, _ = make_webpages(N_DOCS, seed=21)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(pages)), pa.int64()),
        "url": pages["url"], "text": pages["text"], "lang": pages["lang"]}))


def _run(docs, root, cfg):
    from fuzzy_matcher_ray.pipelines.dedup import find_duplicates
    ck = Checkpointer(root, cfg.config_hash())
    out = find_duplicates(docs, cfg, checkpointer=ck) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out, ck


def test_resume_identical_and_skips(docs, tmp_path):
    cfg = PipelineConfig()
    root = str(tmp_path / "ck")
    out1, ck1 = _run(docs, root, cfg)
    assert all(not m.get("resumed") for m in ck1.metrics.values())
    # every stage has a manifest with lineage + metrics
    for stage in ("normalize", "edges_minhash", "clusters"):
        with open(os.path.join(root, stage, "_MANIFEST.json")) as f:
            m = json.load(f)
        assert m["config_hash"] == cfg.config_hash()
        assert m["rows"] >= 0 and m["wall_sec"] >= 0
    # full resume: nothing recomputed, identical output
    out2, ck2 = _run(docs, root, cfg)
    assert all(m.get("resumed") for m in ck2.metrics.values())
    assert out1.equals(out2)


def test_partial_resume_after_kill(docs, tmp_path):
    """Simulate a mid-run kill: remove later-stage checkpoints, rerun —
    early stages resume, later stages rebuild, output identical."""
    cfg = PipelineConfig()
    root = str(tmp_path / "ck")
    out1, _ = _run(docs, root, cfg)
    for stage in ("edges_substring", "edges_all", "clusters"):
        shutil.rmtree(os.path.join(root, stage), ignore_errors=True)
    out2, ck2 = _run(docs, root, cfg)
    assert ck2.metrics["normalize"].get("resumed")
    assert ck2.metrics["edges_minhash"].get("resumed")
    assert not ck2.metrics["clusters"].get("resumed")
    assert out1.equals(out2)


def test_config_change_invalidates(docs, tmp_path):
    cfg1 = PipelineConfig()
    root = str(tmp_path / "ck")
    _run(docs, root, cfg1)
    cfg2 = PipelineConfig(jaccard_threshold=0.7)
    assert cfg1.config_hash() != cfg2.config_hash()
    _, ck2 = _run(docs, root, cfg2)
    assert all(not m.get("resumed") for m in ck2.metrics.values())
