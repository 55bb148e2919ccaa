"""spark-submit --py-files packaging smoke test (north-rule deployment
path): build the zip with scripts/make_pyfiles.py, launch a REAL
spark-submit subprocess whose job file imports resin_spark only from the
zip, and assert the end-to-end build+query result matches the in-process
engine on the same fixture corpus.

Reference analog: the `sir` self-contained binary is the reference's unit
of deployment (/root/reference/src/Sir.Cmd/Program.cs:15-44); Spark-side
it is job script + package zip.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark
    except ImportError:
        return None
    home = os.path.dirname(os.path.abspath(pyspark.__file__))
    cand = os.path.join(home, "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_pyfiles_end_to_end(spark, transcripts, tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on this host")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles import build_zip

    zip_path = build_zip(str(tmp_path / "resin_spark.zip"))
    corpus = str(tmp_path / "transcripts.parquet")
    transcripts.write.parquet(corpus)
    index_root = str(tmp_path / "idx")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    p = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.driver.memory=3g",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_job.py"),
         corpus, index_root, "hello"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),  # NOT the repo: the zip must be the only source
        env=env,
    )
    assert p.returncode == 0, p.stderr[-4000:] + p.stdout[-2000:]
    line = next(ln for ln in p.stdout.splitlines()
                if ln.startswith("SUBMIT_RESULT "))
    got = json.loads(line[len("SUBMIT_RESULT "):])
    assert got["turns"] == transcripts.count()

    # parity: same hits as the in-process engine over its own build
    from resin_spark.build import build_index
    from resin_spark.executor import SearchEngine

    local_root = str(tmp_path / "idx_local")
    build_index(spark, transcripts, local_root)
    want = [
        {"conv_id": r["conv_id"], "turn_idx": r["turn_idx"],
         "score": round(r["score"], 6)}
        for r in SearchEngine(spark, local_root)
        .search({"or": {"text": "hello"}}, k=10).collect()
    ]
    assert got["hits"] == want
