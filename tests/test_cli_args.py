"""CLI argument-surface tests (no Spark session — every case errors out
at the argparse layer, before ``get_spark`` runs)."""

from __future__ import annotations

import pytest

from inclusionreferenceskg_spark.cli import main


def test_missing_subcommand_is_clean_error(capsys):
    with pytest.raises(SystemExit) as e:
        main([])
    assert e.value.code == 2
    assert "synth,run,stream" in capsys.readouterr().err


def test_run_missing_pages_path_is_clean_error(capsys):
    with pytest.raises(SystemExit) as e:
        main(["run", "--pages", "/nonexistent/pages", "--workdir", "/tmp/w"])
    assert e.value.code == 2
    err = capsys.readouterr().err
    assert "--pages path does not exist" in err
    assert "Traceback" not in err


def test_run_scheme_qualified_path_skips_local_check():
    # hdfs:// paths must NOT be rejected by the local existence check;
    # they fail later (inside Spark) — here the error must not be the
    # argparse "does not exist" one.  We only parse-check: a missing
    # required arg still trips first.
    with pytest.raises(SystemExit) as e:
        main(["run", "--pages", "hdfs://nn/pages"])  # missing --workdir
    assert e.value.code == 2
