"""CLI tests (build/search/info/compact/verify) — in-process, CPU."""

import json

import numpy as np
import pytest

from duckdb_lm_diskann_tpu.cli import main

from tests.test_build import clustered_data


@pytest.fixture
def built_index(tmp_path, rng, capsys):
    data = clustered_data(rng, 200, 16, n_clusters=10)
    vec_path = tmp_path / "vecs.npy"
    np.save(vec_path, data)
    db = str(tmp_path / "db")
    rc = main([
        "build", "--db", db, "--index", "idx", "--vectors", str(vec_path),
        "--metric", "l2", "--r", "8", "--l-insert", "16", "--l-search", "32",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["built"] == 200
    return db, data, tmp_path


def test_cli_search(built_index, rng, capsys):
    db, data, tmp_path = built_index
    q_path = tmp_path / "q.npy"
    np.save(q_path, data[:4])
    out_path = tmp_path / "res.npy"
    rc = main([
        "search", "--db", db, "--index", "idx", "--queries", str(q_path),
        "--k", "5", "--out", str(out_path),
    ])
    assert rc == 0
    ids = np.load(out_path)
    assert ids.shape == (4, 5)
    # Self-match first for (nearly) all queries — tiny R=8 graphs can miss
    # one self-neighborhood at this beam width.
    assert (ids[:, 0] == np.arange(4)).sum() >= 3


def test_cli_bench(built_index, capsys):
    db, data, tmp_path = built_index
    q_path = tmp_path / "q.npy"
    np.save(q_path, data[:32])
    rc = main([
        "bench", "--db", db, "--index", "idx", "--queries", str(q_path),
        "--k", "5", "--l-search", "64", "--batch", "16",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["queries"] == 32 and out["qps"] > 0
    assert out["recall_at_k"] >= 0.9  # self-queries on a tiny graph
    assert out["p50_batch_ms"] <= out["p99_batch_ms"]


def test_cli_build_edge_type(tmp_path, rng, capsys):
    data = clustered_data(rng, 100, 16, n_clusters=5)
    vec_path = tmp_path / "vecs.npy"
    np.save(vec_path, data)
    db = str(tmp_path / "db")
    rc = main([
        "build", "--db", db, "--index", "idx", "--vectors", str(vec_path),
        "--metric", "cosine", "--r", "8", "--l-insert", "16",
        "--edge-type", "float1bit",
    ])
    assert rc == 0
    capsys.readouterr()
    assert main(["info", "--db", db, "--index", "idx"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["edge_type"] == "float1bit"


def test_cli_info_compact_verify(built_index, capsys):
    db, _, _ = built_index
    assert main(["info", "--db", db, "--index", "idx"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["count"] == 200 and info["metric"] == "l2"
    assert main(["verify", "--db", db, "--index", "idx"]) == 0
    assert json.loads(capsys.readouterr().out)["ok"] is True
    assert main(["compact", "--db", db, "--index", "idx"]) == 0
    assert json.loads(capsys.readouterr().out)["recycled_slots"] == 0
