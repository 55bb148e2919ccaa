"""resin_spark — a from-scratch PySpark-native full-text index + BM25 engine.

A distributed rebuild of the query semantics of theolivenbaum/resin
(reference at /root/reference, C#/.NET): document store + per-field
inverted index + boolean ranked retrieval, re-expressed Spark-first:

* documents            -> columnar Parquet table (S1/S2/S11, SURVEY.md §2.1)
* tokenize (T1)        -> JVM regex split + Arrow/pandas UDF twin
* index build (I1-I12) -> groupBy(field, term, block) aggregation with
                          structural skew handling (doc-range blocks)
* postings (F3)        -> delta + varint block codec in Arrow UDFs
* boolean query (X4/X5)-> DataFrame join composition (inner/left/anti)
* score (X6)           -> BM25 (k1=1.2, b=0.75) per the north rule
* top-k (X7)           -> orderBy().limit() => TakeOrderedAndProject
* fetch (X8)           -> broadcast join of top-k keys to documents
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy — keep `import resin_spark.tokenizer` light
    if name in ("SearchEngine", "build_index", "resume_build"):
        from resin_spark import api

        return getattr(api, name)
    raise AttributeError(name)
