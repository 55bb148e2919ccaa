"""CLI surface (cli.py) + engine edge cases: unknown fields, unmatched
terms, empty inputs — the paths a production query front-end hits."""

import json

import pytest
from pyspark.sql import functions as F

from resin_spark import cli
from resin_spark.executor import SearchEngine


def test_cli_package(capsys):
    assert cli.main(["package"]) == 0
    out = capsys.readouterr().out.strip()
    assert out.endswith(".zip")


def test_cli_build_and_search(spark, transcripts, tmp_path, capsys):
    src = str(tmp_path / "in")
    transcripts.write.mode("overwrite").parquet(src)
    root = str(tmp_path / "idx")
    assert cli.main(["build", "--input", src, "--root", root]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["turns"] == transcripts.count()
    assert cli.main(
        ["search", "--root", root, "--q", '{"or": {"text": "banana"}}', "--k", "3"]
    ) == 0
    out = capsys.readouterr().out
    assert "banana" in out

    assert cli.main(["optimize", "--root", root]) == 0
    capsys.readouterr()
    assert cli.main(
        ["search", "--root", root, "--q", '{"or": {"text": "banana"}}', "--k", "3"]
    ) == 0
    assert "banana" in capsys.readouterr().out

    assert cli.main(["truncate", "--root", root]) == 0


def test_search_unknown_field(engine):
    """A field that was never indexed matches nothing (no exception)."""
    assert engine.topk({"or": {"nosuchfield": "banana"}}, k=5) == []


def test_search_unmatched_term_skipped(engine, oracle):
    """Resin skips unmatched terms in the fold (Reducer.cs:88-89): an OR
    with one bogus token scores like the real token alone."""
    got = engine.topk({"or": {"text": "banana zzzznope"}}, k=5)
    want = engine.topk({"or": {"text": "banana"}}, k=5)
    assert got == want


def test_search_all_terms_unmatched(engine):
    assert engine.topk({"and": {"text": "zzzznope qqqqnada"}}, k=5) == []


def test_search_empty_query_text(engine):
    assert engine.topk({"or": {"text": "  ...  "}}, k=5) == []


def test_search_not_only_clause(engine):
    """A lone NOT clause has nothing to subtract from -> empty."""
    assert engine.topk({"not": {"text": "banana"}}, k=5) == []


def test_skip_beyond_results(engine):
    n = len(engine.topk({"or": {"text": "banana"}}, k=0))
    assert engine.topk({"or": {"text": "banana"}}, k=10, skip=n + 5) == []


def test_fetch_missing_doc(engine):
    assert engine.fetch("conv_does_not_exist", 0).count() == 0
