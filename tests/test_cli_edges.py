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


def test_cli_resin_model_and_wet_build(spark, transcripts, tmp_path, capsys):
    from tests.test_api_surface import WET_SAMPLE

    src = str(tmp_path / "in")
    transcripts.write.mode("overwrite").parquet(src)
    root = str(tmp_path / "idx")
    assert cli.main(["build", "--input", src, "--root", root]) == 0
    capsys.readouterr()
    # resin cosine model accepts plain text, survives a typo
    assert cli.main(["search", "--root", root, "--q", "applw",
                     "--model", "resin", "--k", "3"]) == 0
    assert "apple" in capsys.readouterr().out

    wet = tmp_path / "sample.warc.wet"
    wet.write_text(WET_SAMPLE)
    root2 = str(tmp_path / "idx_wet")
    assert cli.main(["build", "--input", str(wet), "--root", root2,
                     "--format", "wet"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["turns"] == 2
    eng = SearchEngine(spark, root2)
    assert eng.topk({"or": {"text": "beta"}}, k=3)


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


def test_build_empty_corpus(spark, tmp_path):
    """A zero-row input builds an empty-but-valid index: stats rows
    exist, searches return nothing, no exceptions."""
    from resin_spark.build import build_index, read_stats
    from resin_spark.fixtures import TRANSCRIPT_SCHEMA

    empty = spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)
    root = str(tmp_path / "empty_idx")
    out = build_index(spark, empty, root, fields=("text",))
    assert out["turns"] == 0
    st = {r["field"]: r for r in read_stats(spark, root).collect()}
    assert st["text"]["n_docs"] == 0 and st["text"]["total_tokens"] == 0
    eng = SearchEngine(spark, root, fields=("text",))
    assert eng.topk({"or": {"text": "banana"}}, k=5) == []
    assert eng.doc_count() == 0


def test_build_null_and_empty_text(spark, tmp_path):
    """Rows with NULL/empty/whitespace text index cleanly (dl=0, no
    postings) and still exist in the docs table."""
    from resin_spark.build import build_index

    rows = [
        ("c1", 0, "user", None, "", None),
        ("c1", 1, "assistant", "", "", None),
        ("c2", 0, "user", "   \t  ", "", None),
        ("c2", 1, "tool", "banana split", "calc", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    root = str(tmp_path / "null_idx")
    build_index(spark, df, root, fields=("text",))
    eng = SearchEngine(spark, root, fields=("text",))
    assert eng.doc_count() == 4  # all rows stored
    hits = eng.topk({"or": {"text": "banana"}}, k=5)
    assert [h[0] for h in hits] == [("c2", 1)]


def test_cli_write_and_result_sink(spark, transcripts, tmp_path, capsys):
    """S8 write command (append segment) + S9 --out JSON result sink."""
    from pyspark.sql import functions as F

    w1 = transcripts.filter(F.col("conv_id") < "conv00000005")
    w2 = transcripts.filter(F.col("conv_id") >= "conv00000005")
    src1, src2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    w1.write.mode("overwrite").parquet(src1)
    w2.write.mode("overwrite").parquet(src2)

    root = str(tmp_path / "idx")
    assert cli.main(["build", "--input", src1, "--root", root]) == 0
    capsys.readouterr()
    assert cli.main(["write", "--input", src2, "--root", root]) == 0
    appended = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert appended["segment"] >= 1

    out_path = str(tmp_path / "res_json")
    assert cli.main(
        ["search", "--root", root, "--q", '{"or": {"text": "banana"}}',
         "--k", "3", "--out", out_path]
    ) == 0
    back = spark.read.json(out_path)
    assert back.count() > 0 and "score" in back.columns


def test_cli_resin_model_honors_out(spark, transcripts, tmp_path, capsys):
    src = str(tmp_path / "in")
    transcripts.write.mode("overwrite").parquet(src)
    root = str(tmp_path / "idx")
    assert cli.main(["build", "--input", src, "--root", root]) == 0
    capsys.readouterr()
    out_path = str(tmp_path / "resin_res")
    assert cli.main(
        ["search", "--root", root, "--q", "banana", "--model", "resin",
         "--k", "3", "--out", out_path]
    ) == 0
    back = spark.read.json(out_path)
    assert back.count() > 0 and "score" in back.columns


def test_cli_search_snippet_and_phrase(spark, transcripts, tmp_path, capsys):
    src = str(tmp_path / "snip_in")
    transcripts.write.mode("overwrite").parquet(src)
    root = str(tmp_path / "snip_idx")
    assert cli.main(["build", "--input", src, "--root", root]) == 0
    capsys.readouterr()
    assert cli.main(["search", "--root", root,
                     "--q", '{"or": {"text": "banana"}}',
                     "--snippet", "--k", "3"]) == 0
    out = capsys.readouterr().out
    assert "snippet" in out and "banana" in out
    assert cli.main(["search", "--root", root, "--q", "term97 hotterm",
                     "--phrase", "--snippet", "--k", "3"]) == 0
    out = capsys.readouterr().out
    assert "snippet" in out and "term97 hotterm" in out


def test_cli_compare(capsys):
    """StringCompare analog (Program.cs:10-44): identical char bags
    (anagrams) score 1.0 and report identical; disjoint bags score low."""
    assert cli.main(["compare", "listen", "silent"]) == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["cosine"] == pytest.approx(1.0) and res["identical"]
    assert cli.main(["compare", "Hello World", "world hello"]) == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["cosine"] == pytest.approx(1.0) and res["identical"]
    assert cli.main(["compare", "abc", "xyz"]) == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["cosine"] == 0.0 and not res["identical"]
    assert cli.main(["compare", "apple", "applw"]) == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert 0.5 < res["cosine"] < 1.0


def test_cli_phrase_rejects_resin_model(capsys):
    """--phrase/--snippet with --model resin would be silently ignored;
    the parser must reject the combination instead."""
    with pytest.raises(SystemExit) as e:
        cli.main(["search", "--root", "/tmp/x", "--q", "a b",
                  "--phrase", "--model", "resin"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        cli.main(["search", "--root", "/tmp/x", "--q", "a",
                  "--snippet", "--model", "resin"])
    assert e.value.code == 2


def test_cli_snippet_follows_field(spark, transcripts, tmp_path, capsys):
    """--snippet must highlight the SEARCHED field (--field), not
    hardcode text: a phrase search over `role` snippets the role column."""
    src = str(tmp_path / "snipf_in")
    transcripts.write.mode("overwrite").parquet(src)
    root = str(tmp_path / "snipf_idx")
    assert cli.main(["build", "--input", src, "--root", root]) == 0
    capsys.readouterr()
    assert cli.main(["search", "--root", root, "--q", "user",
                     "--phrase", "--field", "role", "--snippet",
                     "--k", "2"]) == 0
    out = capsys.readouterr().out
    assert "snippet" in out and "user" in out


def test_cli_truncate_index_and_slice(spark, transcripts, tmp_path,
                                      capsys):
    """truncate-index drops the index but keeps docs (Program.cs:55-58);
    slice copies the first N bytes of a file (Program.cs:127-141)."""
    import os

    from resin_spark import build as B

    src = str(tmp_path / "in")
    transcripts.write.mode("overwrite").parquet(src)
    root = str(tmp_path / "idx")
    assert cli.main(["build", "--input", src, "--root", root]) == 0
    capsys.readouterr()
    assert cli.main(["truncate-index", "--root", root]) == 0
    assert "index truncated" in capsys.readouterr().out
    assert not B._exists(spark, B.p_postings(root))
    assert B._exists(spark, B.p_docs(root))
    assert spark.read.parquet(B.p_docs(root)).count() == transcripts.count()

    big = tmp_path / "dump.bin"
    big.write_bytes(bytes(range(256)) * 4)
    out = tmp_path / "slice.bin"
    assert cli.main(["slice", "--source", str(big), "--result", str(out),
                     "--length", "100"]) == 0
    assert out.read_bytes() == bytes(range(100))
    assert os.path.getsize(out) == 100
    # length past EOF copies what exists and reports the TRUE byte count
    assert cli.main(["slice", "--source", str(big), "--result", str(out),
                     "--length", "999999"]) == 0
    assert "wrote 1024 bytes" in capsys.readouterr().out
    assert out.read_bytes() == bytes(range(256)) * 4
    # negative length is a usage error, not a whole-file copy
    assert cli.main(["slice", "--source", str(big), "--result", str(out),
                     "--length", "-1"]) == 2
