"""CLI argument-surface tests (no Spark session — every case errors out
at the argparse layer, before ``get_spark`` runs)."""

from __future__ import annotations

import pytest

from inclusionreferenceskg_spark.cli import main


def test_missing_subcommand_is_clean_error(capsys):
    with pytest.raises(SystemExit) as e:
        main([])
    assert e.value.code == 2
    assert "synth,run,upsert,stream" in capsys.readouterr().err


def test_run_missing_pages_path_is_clean_error(capsys):
    with pytest.raises(SystemExit) as e:
        main(["run", "--pages", "/nonexistent/pages", "--workdir", "/tmp/w"])
    assert e.value.code == 2
    err = capsys.readouterr().err
    assert "--pages path does not exist" in err
    assert "Traceback" not in err


def test_run_cluster_env_skips_local_check(monkeypatch, capsys):
    # with a cluster master (or HADOOP_CONF_DIR), scheme-less paths
    # resolve against fs.defaultFS — the local existence probe must not
    # reject them.  get_spark is stubbed to a sentinel: reaching it
    # proves the argparse layer let the path through.
    import inclusionreferenceskg_spark.cli as cli_mod

    class _Sentinel(Exception):
        pass

    def _boom(*a, **kw):
        raise _Sentinel()

    monkeypatch.setenv("SPARK_GRAFT_MASTER", "yarn")
    monkeypatch.setattr(cli_mod, "get_spark", _boom)
    with pytest.raises(_Sentinel):
        main(["run", "--pages", "/nonexistent/pages",
              "--workdir", "/tmp/w"])
    assert "--pages path does not exist" not in capsys.readouterr().err


def test_metrics_reads_manifests_without_spark(tmp_path, capsys):
    import json
    import os
    lineage = tmp_path / "_lineage"
    os.makedirs(lineage)
    for s, rows in (("nodes", 42), ("triples", 7)):
        with open(lineage / f"{s}.json", "w") as f:
            json.dump({"stage": s, "rows": rows, "checksum": "abc",
                       "wall_ms": 5,
                       "partitions": [{"partition": "lang=en", "rows": rows}]},
                      f)
    rc = main(["metrics", "--workdir", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["nodes"]["rows"] == 42
    assert out["triples"]["n_partitions"] == 1
    assert out["nodes"]["partitions"][0]["partition"] == "lang=en"

    rc = main(["metrics", "--workdir", str(tmp_path), "--stage", "nodes"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert list(out) == ["nodes"]


def test_run_scheme_qualified_path_skips_local_check():
    # hdfs:// paths must NOT be rejected by the local existence check;
    # they fail later (inside Spark) — here the error must not be the
    # argparse "does not exist" one.  We only parse-check: a missing
    # required arg still trips first.
    with pytest.raises(SystemExit) as e:
        main(["run", "--pages", "hdfs://nn/pages"])  # missing --workdir
    assert e.value.code == 2


def test_stream_triples_requires_out(capsys):
    with pytest.raises(SystemExit) as e:
        main(["stream", "--in", "/tmp/in", "--checkpoint", "/tmp/c"])
    assert e.value.code == 2
    assert "--out is required with --mode triples" in capsys.readouterr().err


def test_stream_upsert_requires_workdir(capsys):
    with pytest.raises(SystemExit) as e:
        main(["stream", "--in", "/tmp/in", "--checkpoint", "/tmp/c",
              "--mode", "upsert"])
    assert e.value.code == 2
    assert "--workdir is required with --mode upsert" \
        in capsys.readouterr().err
