"""Query-driven CommonCrawl WET ingestion — the CrawlJob analog.

The reference's crawl feature (src/Sir.HttpServer/Features/
CrawlJob.cs:17-100, enqueued by Controllers/CrawlController.cs:41-90,
polled via Controllers/StatusController.cs:25-41) is a background job
that:

1. searches an existing (WAT-derived) collection for documents carrying
   WARC filenames (select url/title/filename, CrawlJob.cs:75-87);
2. maps each filename to its WET twin — ``/warc`` -> ``/wet``,
   ``.gz`` -> ``.wet.gz`` (CrawlJob.cs:95-97) — and, by the job's own
   ``break`` (CrawlJob.cs:100), processes ONLY the first result's file;
3. skips a WET file whose records were already indexed (an AND query on
   cc_wet's filename field, CrawlJob.cs:105-118);
4. obtains the file locally — the reference downloads it from the
   CommonCrawl S3 bucket when absent (CrawlJob.cs:120-162).  This
   sandbox has no network, so the analog reads from a local directory
   (``wet_dir``) only and reports a missing file as a job error instead
   of fetching it; everything else is preserved;
5. parses the WET records, keeps ONLY those whose URL appeared in the
   original search result, carrying the original doc's title and
   filename over (CrawlJob.cs:185-198);
6. writes the batch into the ``cc_wet`` collection (CrawlJob.cs:203-213)
   and reports progress via a Status dict with ``download`` / ``index``
   percentages (CrawlJob.cs:52-53).

Spark-first shape: the original result is k-bounded (take), so it joins
against the (arbitrarily large) WET scan as a BROADCAST inner join on
url — the WET side streams through the scan once, nothing is collected
but the final bounded write batch's lineage.  Field mapping onto the
transcript document shape follows the repo convention
(sources.transcripts_from_docs): conv_id=url, text=WET body (the
reference's indexed "description"), role=title (indexed), tool=WET
filename (the reference's stored "filename", used by the
already-indexed check).
"""

from __future__ import annotations

import threading
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def wet_file_id(warc_filename: str) -> str:
    """WARC path -> its WET twin (CrawlJob.cs:95-97)."""
    return warc_filename.replace("/warc", "/wet").replace(".gz", ".wet.gz")


def _target_engine(spark: SparkSession, target_root: str):
    """One engine for the whole probe loop (stats + df-mirror reads are
    paid once per job, not once per WET file); None when the target has
    no index yet."""
    from resin_spark import build as B
    from resin_spark.executor import SearchEngine

    if not B._exists(spark, B.p_postings(target_root)):
        return None
    return SearchEngine(spark, target_root)


def _target_has_file(target_eng, wet_id: str) -> bool:
    """Already-indexed check: an AND query on the target's filename
    (=tool) field, exactly the reference's wetQuery probe
    (CrawlJob.cs:105-118) — tokenized match, take=1."""
    from resin_spark.query import parse_flat

    if target_eng is None:
        return False
    q = parse_flat(wet_id, ["tool"], op="and")
    return len(target_eng.search(q, k=1).take(1)) > 0


def crawl_wet(
    spark: SparkSession,
    root_dir: str,
    collections: list[str],
    q: str,
    fields: list[str],
    wet_dir: str,
    op: str = "or",
    skip: int = 0,
    take: int = 10,
    target: str = "cc_wet",
    first_file_only: bool = True,
    status: dict | None = None,
    engine_factory: Callable[[str], object] | None = None,
) -> dict:
    """Run one crawl job synchronously; returns (and live-updates) the
    job's Status dict: ``download``/``index`` percentages like the
    reference (CrawlJob.cs:52-53) plus ``written``, ``skipped_files``,
    ``errors`` and the terminal ``state``.

    ``first_file_only`` mirrors the reference job's ``break``
    (CrawlJob.cs:100): only the FIRST result's WET file is processed per
    run.  Pass False to process every distinct file the result names.
    ``engine_factory`` lets a server share its engine cache; the default
    opens ``{root_dir}/{collection}`` directly.
    """
    import os

    from resin_spark.api import append_docs
    from resin_spark.executor import SearchEngine, multi_search
    from resin_spark.query import parse_flat
    from resin_spark.sources import read_wet_docs

    st = status if status is not None else {}
    st.update({"download": 0, "index": 0, "written": 0,
               "skipped_files": [], "errors": [], "state": "running"})

    def fail(msg: str) -> dict:
        st["errors"].append(msg)
        st["state"] = "error"
        return st

    try:
        mk = engine_factory or (
            lambda c: SearchEngine(spark, f"{root_dir}/{c}"))
        query = parse_flat(q, fields, op=op,
                           select=["conv_id", "role", "tool"])
        if len(collections) == 1:
            hits = mk(collections[0]).search(query, k=take, skip=skip)
        else:
            # multi-collection page: skip is plumbed through and the
            # stored role/tool fields are projected alongside the keys
            # (the reference job reads title/filename off each hit)
            hits = multi_search({c: mk(c) for c in collections},
                                query, k=take, skip=skip,
                                select=["role", "tool"])
        # k-bounded collect, like the reference's ToDictionary over the
        # page (CrawlJob.cs:85-87); url -> (title, warc filename).  The
        # dictionary is KEYED on url — a url hit in several collections
        # keeps only its best-ranked row (a duplicate in orig_df would
        # fan out the WET join and ingest the record twice)
        originals, seen_urls = [], set()
        for r in hits.collect():
            if r["conv_id"] not in seen_urls:
                seen_urls.add(r["conv_id"])
                originals.append((r["conv_id"], r["role"], r["tool"]))
        if not originals:
            st.update({"download": 100, "index": 100, "state": "done"})
            return st

        wet_ids: list[str] = []
        for _url, _title, warc in originals:
            wid = wet_file_id(warc)
            if wid not in wet_ids:
                wet_ids.append(wid)
            if first_file_only:
                break  # the reference job's quirk, CrawlJob.cs:100

        target_root = f"{root_dir}/{target}"
        target_eng = _target_engine(spark, target_root)
        to_read: list[str] = []
        for wid in wet_ids:
            if _target_has_file(target_eng, wid):
                st["skipped_files"].append(wid)
            elif not os.path.exists(os.path.join(wet_dir, wid)):
                # the reference would download from the CommonCrawl
                # bucket here (CrawlJob.cs:130-162); this sandbox is
                # offline by design, so a missing local file is an error
                fail(f"WET file not present locally: {wid}")
            else:
                to_read.append(wid)
        st["download"] = 100
        if not to_read:
            if st["state"] != "error":
                st.update({"index": 100, "state": "done"})
            return st

        # small side: the original result (<= take rows) -> broadcast
        orig_df = spark.createDataFrame(
            [(u, t if t is not None else "") for u, t, _ in originals],
            "url string, title string",
        )
        written = 0
        for wid in to_read:
            wet = read_wet_docs(spark, os.path.join(wet_dir, wid))
            batch = (
                wet.join(F.broadcast(orig_df), "url", "inner")
                .select(
                    F.col("url").alias("conv_id"),
                    F.lit(0).alias("turn_idx"),
                    # title carried over from the original doc
                    # (CrawlJob.cs:192-195)
                    F.col("title").alias("role"),
                    F.col("text"),
                    F.lit(wid).alias("tool"),
                    F.lit(None).cast("timestamp").alias("ts"),
                )
            )
            # the WET scan + broadcast join is the job's dominant I/O;
            # persist the bounded batch so count() and the segment build
            # share one pass over the file instead of scanning it twice
            batch = batch.persist()
            try:
                n = batch.count()
                if n:
                    append_docs(spark, batch, target_root)
                    written += n
            finally:
                batch.unpersist()
        st.update({"index": 100, "written": written,
                   "state": st["state"] if st["state"] == "error"
                   else "done"})
        return st
    except Exception as e:  # job surface: errors land in Status, like
        # the reference's catch-all (CrawlJob.cs:64-68)
        return fail(f"{type(e).__name__}: {e}")


class CrawlQueue:
    """AsyncJob queue analog (the reference enqueues CrawlJobs on a
    background queue and the status page polls GetStatus(crawlid),
    CrawlController.cs:72-90 / StatusController.cs:25-41): ONE daemon
    worker drains the queue SEQUENTIALLY, statuses kept by crawl id.

    Sequential processing is load-bearing, not a simplification: two
    crawl jobs running concurrently against the same target collection
    would both read the same ``completed_segments`` set, compute the
    same next segment id, and race the conv-dim extension — two writers
    on one index.  The reference gets the same guarantee from its
    single-consumer job queue."""

    def __init__(self) -> None:
        import queue

        self._status: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._q: "queue.Queue[tuple[Callable[[dict], dict], dict]]" = (
            queue.Queue())
        self._worker: threading.Thread | None = None

    def _drain(self) -> None:
        while True:
            fn, st = self._q.get()
            try:
                fn(st)
            except Exception as e:  # fn's own catch-all should make
                # this unreachable; never kill the worker
                st.setdefault("errors", []).append(
                    f"{type(e).__name__}: {e}")
                st["state"] = "error"
            finally:
                self._q.task_done()

    def enqueue(self, fn: Callable[[dict], dict],
                crawlid: str | None = None) -> str:
        """Queue a job.  A caller-supplied crawlid that still names a
        LIVE job (queued/running) is rejected — replacing the entry
        would orphan the live job's status dict; a terminal id may be
        reused (re-running a finished job is the retry path)."""
        cid = crawlid or str(uuid.uuid4())
        st: dict = {"state": "queued"}
        with self._lock:
            prev = self._status.get(cid)
            if prev is not None and prev.get("state") in (
                    "queued", "running"):
                raise ValueError(f"crawl {cid} is already "
                                 f"{prev['state']}")
            self._status[cid] = st
            if self._worker is None or not self._worker.is_alive():
                self._worker = threading.Thread(
                    target=self._drain, daemon=True)
                self._worker.start()
        self._q.put((fn, st))
        return cid

    def get_status(self, crawlid: str) -> dict | None:
        with self._lock:
            return self._status.get(crawlid)
