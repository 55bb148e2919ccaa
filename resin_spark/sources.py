"""Document sources (SURVEY.md §2.1 S4-S6).

The reference ships dataset-specific readers:
* S4 Wikipedia: gzipped Cirrus-search JSON dump with per-field
  store/index flags (src/Sir.Wikipedia/WikipediaHelper.cs:16-70)
* S6 CommonCrawl WET: plain-text records -> (url, text) docs
  (src/Sir.CommonCrawl/IndexWetFilesCommand.cs:41-85)

Spark-first: gzip is transparent to spark.read.json / spark.read.text;
the store/index flags become column selection — `store_fields` is what
lands in the documents table, `index_fields` is what the tokenize stage
consumes (build_index(fields=...)).  skip/take paging maps to
offset/limit over a deterministic ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_docs(
    spark: SparkSession,
    path: str,
    store_fields: list[str],
    id_field: str | None = None,
    skip: int = 0,
    take: int = 0,
) -> DataFrame:
    """S4: (gzipped) JSON-lines -> projected docs.  Column pruning pushes
    into the scan; gzip decompression is transparent (splittable formats
    like zstd-parquet preferred at 100 TB — gzip is not splittable)."""
    df = spark.read.json(path)
    cols = [c for c in store_fields if c in df.columns]
    if not cols:
        raise ValueError(
            f"none of store_fields {store_fields} exist in {path} "
            f"(columns: {df.columns})"
        )
    if skip or take:
        # order BEFORE projecting so id_field need not be a stored field;
        # include all stored columns as tie-breaks — paging on a
        # non-unique key alone would make skip/take nondeterministic
        order = id_field if id_field and id_field in df.columns else cols[0]
        df = df.orderBy(order, *[c for c in cols if c != order])
        if skip:
            df = df.offset(skip)
        if take:
            df = df.limit(take)
    return df.select(*cols)


def read_text_docs(spark: SparkSession, path: str) -> DataFrame:
    """Plain text (optionally gzipped), one doc per line with a stable
    line-hash id (the simple line-per-doc source)."""
    df = spark.read.text(path)
    return df.select(
        F.xxhash64("value").alias("doc_id"), F.col("value").alias("text")
    ).filter(F.length("text") > 0)


def read_wet_docs(spark: SparkSession, path: str) -> DataFrame:
    """S6: CommonCrawl WET records -> (url, text) docs.

    Faithful to ReadWetFile (/root/reference/src/Sir.CommonCrawl/
    IndexWetFilesCommand.cs:41-85): a record's url comes from its
    ``WARC-Target-URI:`` header, its text is the body after the header
    block, with empty lines dropped; the leading warcinfo record (no
    target URI — what the reference's ``Skip(15)`` jumps over) is
    filtered out.

    Spark-first instead of a stateful line parser: reading with
    ``lineSep="WARC/1.0"`` makes each ROW one whole WARC record (the
    Hadoop text reader handles delimiters spanning split boundaries, so
    this stays splittable at 100 TB), and header/body extraction is pure
    JVM string expressions — no Python in the path."""
    rec = spark.read.option("lineSep", "WARC/1.0").text(path)
    url = F.regexp_extract("value", r"WARC-Target-URI:\s*(\S+)", 1)
    # body = everything after the first blank line; reference drops empty
    # lines inside the content (content.AppendLine only when non-empty)
    body = F.element_at(F.split("value", r"\r?\n\r?\n", 2), 2)
    text = F.array_join(
        F.filter(F.split(body, r"\r?\n"), lambda x: x != F.lit("")), "\n"
    )
    return (
        rec.select(url.alias("url"), text.alias("text"))
        .filter((F.col("url") != "") & (F.length("text") > 0))
    )


def read_wat_docs(spark: SparkSession, path: str,
                  filename: str | None = None) -> DataFrame:
    """S5: CommonCrawl WAT metadata records -> docs with
    (title, description, scheme, host, path, query, url, filename).

    Faithful to CCHelper.ReadWatFile (/root/reference/src/Sir.CommonCrawl/
    CCHelper.cs:68-152): each '{'-prefixed line is one JSON record; only
    WARC-Type == "response" records are kept; title comes from
    HTML-Metadata.Head.Title, description from the Head.Metas entry named
    "description"; the URI is split into scheme/host/path/query.

    Spark-first: line-per-record text scan + from_json with a NARROW
    schema (only the fields used — the parser never materializes the
    rest of the record) + parse_url; no Python in the path.  Documented
    deviations: url_decode is form-style percent-decoding, and query
    comes back without the leading '?' (parse_url semantics)."""
    from pyspark.sql.types import (ArrayType, MapType, StringType,
                                   StructField, StructType)

    head = StructType([
        StructField("Title", StringType()),
        StructField("Metas", ArrayType(MapType(StringType(), StringType()))),
    ])
    schema = StructType([
        StructField("Envelope", StructType([
            StructField("WARC-Header-Metadata", StructType([
                StructField("WARC-Type", StringType()),
                StructField("WARC-Target-URI", StringType()),
            ])),
            StructField("Payload-Metadata", StructType([
                StructField("HTTP-Response-Metadata", StructType([
                    StructField("HTML-Metadata", StructType([
                        StructField("Head", head),
                    ])),
                ])),
            ])),
        ])),
    ])
    rec = (
        spark.read.text(path)
        .filter(F.col("value").startswith("{"))
        .select(F.from_json("value", schema).alias("j"))
    )
    hdr = F.col("j")["Envelope"]["WARC-Header-Metadata"]
    head_col = (F.col("j")["Envelope"]["Payload-Metadata"]
                ["HTTP-Response-Metadata"]["HTML-Metadata"]["Head"])
    raw = hdr["WARC-Target-URI"]  # escaped form — what parse_url expects
    desc_metas = F.filter(
        head_col["Metas"],
        lambda m: F.lower(m["name"]) == "description",
    )
    description = F.when(F.size(desc_metas) > 0,
                         F.element_at(desc_metas, 1)["content"])
    return (
        rec.filter(hdr["WARC-Type"] == "response")
        .select(
            head_col["Title"].alias("title"),
            description.alias("description"),
            F.lower(F.try_parse_url(raw, F.lit("PROTOCOL"))).alias("scheme"),
            F.try_parse_url(raw, F.lit("HOST")).alias("host"),
            F.url_decode(F.try_parse_url(raw, F.lit("PATH"))).alias("path"),
            F.try_parse_url(raw, F.lit("QUERY")).alias("query"),
            F.url_decode(raw).alias("url"),
            F.lit(filename).cast("string").alias("filename"),
        )
    )


def transcripts_from_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adapt any (id, text) document table to the engine's transcript
    input shape: one single-turn conversation per document."""
    return docs.select(
        F.col(id_col).cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col(text_col).alias("text"),
        F.lit("").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
