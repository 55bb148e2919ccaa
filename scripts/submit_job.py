"""spark-submit entry job: build an index from a transcript parquet table,
run one BM25 query, print a single JSON result line.

This is the cluster packaging path of the north rule ("run via
spark-submit --py-files"): the resin_spark package is NOT importable from
the job file's own directory — it arrives through ``--py-files
resin_spark.zip`` (build the zip with ``python scripts/make_pyfiles.py``),
which spark-submit places on the driver's and every executor's
PYTHONPATH.  The reference's analog is its self-contained `sir` dotnet
binary (``/root/reference/src/Sir.Cmd/README.md``); Spark-side the unit
of deployment is the job script + the package zip.

Usage:
  spark-submit --master <master> --py-files resin_spark.zip \
      scripts/submit_job.py <transcripts.parquet> <index_root> [query_text]
"""

import json
import sys

from pyspark.sql import SparkSession


def main(argv):
    transcripts_path, index_root = argv[0], argv[1]
    query_text = argv[2] if len(argv) > 2 else "hello"

    # master/deploy conf comes from the spark-submit command line
    spark = SparkSession.builder.appName("resin_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # import AFTER getOrCreate so a missing --py-files fails loudly here,
    # with the zip-packaging hint, not with a bare ImportError traceback
    try:
        from resin_spark.build import build_index
        from resin_spark.executor import SearchEngine
    except ImportError as exc:  # pragma: no cover - operator error path
        raise SystemExit(
            "resin_spark is not on the PYTHONPATH - submit with "
            "--py-files resin_spark.zip (python scripts/make_pyfiles.py)"
        ) from exc

    stats = build_index(spark, spark.read.parquet(transcripts_path),
                        index_root)
    eng = SearchEngine(spark, index_root)
    rows = eng.search({"or": {"text": query_text}}, k=10).collect()
    print("SUBMIT_RESULT " + json.dumps({
        "turns": stats["turns"],
        "segments": stats["segments"],
        "query": query_text,
        "hits": [
            {"conv_id": r["conv_id"], "turn_idx": r["turn_idx"],
             "score": round(r["score"], 6)}
            for r in rows
        ],
    }))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
