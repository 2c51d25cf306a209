"""CrawlEngine — the crawl loop as a sequence of Spark batch jobs.

One crawl round = ONE Spark job (SURVEY.md §3.2 Spark equivalent):

    pending = frontier ANTI-JOIN progress            (claim set, F3/J2)
    scheduled = rank window per host under budget    (W1/W4; compat: global ZREVRANGE order)
    gate by robots (broadcast join + Arrow UDF)      (J3/F4/C9)
    fetch = join web_graph, join payloads, decode    (J4/S5/C7, Arrow batches)
    append pages; expand links -> canonicalize ->    (S7/C1/C2/C4/C5)
    first-wins in-round dedup -> bloom prefilter ->
    exact seen anti-join -> append frontier          (J1)
    append progress + metrics; checkpoint            (A8, exact resume)

State lives in SnapshotStore tables (frontier / progress / pages /
metrics); the driver is the only committer, so rounds are snapshot-isolated
and idempotent: resume = rollback to the last checkpoint and re-enter the
loop (SURVEY.md §4.2 "exact resume").

Reference semantics preserved (each cited in the operator modules):
enqueue-time first-wins dedup, priority = max(0.1, 1 - parent_depth*0.1),
depth gate `depth < max_depth`, validity regex on extracted links only
(seeds bypass it, CrawlerManager.java:109-120), robots-blocked pages saved
with 403 and marked FAILED (BasicCrawler.java:54-69 -> markFailed), failed
URLs never retried (URLFrontier.java:198-202).

Scale design notes:
- pending/scheduled shuffles on `host` once; the robots join is broadcast;
  the fetch join is salted for hot hosts above config.hot_host_threshold
  (plus AQE skew splitting as backstop),
- the seen anti-join is bloom-prefiltered: at fpp 0.01 ~99% of truly-new
  candidates skip the frontier-sized join entirely (J1 scale path),
- the global `orderBy().limit()` exists ONLY behind reference_compat for
  parity testing; the clean path never globally sorts the frontier,
- all timestamps/sequence numbers are derived from (round, sort keys) —
  no wall clock in data, so reruns and resumes are byte-identical.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions import urls as U
from ..functions.robots_fn import gate_by_robots, parse_robots_table
from ..operators import topk
from ..operators.bloom import BloomFilter, bloom_prefilter_udf, build_bloom
from ..sources import codec
from ..sources.store import SnapshotStore

PAGES_SCHEMA = (
    "session_id string, round int, sched_seq int, url string, url_hash long, host string, "
    "depth int, parent_url string, status_code int, error_message string, image_id string, "
    "caption string, bytes binary, fmt string, content_length long, decoded_w int, "
    "decoded_h int, phash long, crawl_duration_ms long, partition_id int"
)


def _fetch_decode_fn(store_bytes: bool):
    """mapInPandas body factory: per Arrow batch, resolve fetch outcome +
    decode the image payload. The decode is the single PIL-swap point
    (sources/codec). With ``store_bytes=False`` the decoded/validated blob
    is NOT echoed into the output rows (pages reference it by image_id) —
    at the 10^10 tier inlining would duplicate the payload store and the
    copy dominates Arrow return traffic + the pages write."""

    def _fetch_decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                web_status = r.web_status
                if web_status is None or pd.isna(web_status):
                    status, err = 0, "connection failed"
                else:
                    status = int(web_status)
                    err = None if status == 200 else ("I/O error" if status == 0 else f"HTTP {status}")
                by = r.pbytes
                caption = r.caption if status == 200 else None
                dw = dh = ph = None
                blob = None
                if status == 200 and by is not None and not (isinstance(by, float) and pd.isna(by)):
                    blob = bytes(by)
                    try:
                        px, _fmt = codec.decode_image(blob)
                        dh, dw = px.shape[0], px.shape[1]
                        ph = codec.phash64(px)
                    except codec.CodecError as e:
                        err = f"decode error: {e}"
                out.append((
                    r.session_id, int(r.round), int(r.sched_seq), r.url, int(r.url_hash), r.host,
                    int(r.depth), r.parent_url, status, err, r.image_id, caption,
                    blob if store_bytes else None,
                    r.fmt if status == 200 else None, len(blob) if blob is not None else None,
                    dw, dh, ph, 0, pid,
                ))
            yield pd.DataFrame(out, columns=[
                "session_id", "round", "sched_seq", "url", "url_hash", "host", "depth",
                "parent_url", "status_code", "error_message", "image_id", "caption", "bytes",
                "fmt", "content_length", "decoded_w", "decoded_h", "phash",
                "crawl_duration_ms", "partition_id"])

    return _fetch_decode


def _metrics_schema():
    """Arrow schema for the per-round metrics snapshot (A8) — written
    driver-side (Table.append_rows); types mirror the Spark DDL the table
    used historically (int round, long counters, double avg/wall)."""
    import pyarrow as pa

    return pa.schema([
        pa.field("session_id", pa.string()), pa.field("round", pa.int32()),
        pa.field("scheduled", pa.int64()), pa.field("ok", pa.int64()),
        pa.field("failed", pa.int64()), pa.field("robots_blocked", pa.int64()),
        pa.field("bytes_total", pa.int64()), pa.field("avg_depth", pa.float64()),
        pa.field("new_urls", pa.int64()), pa.field("wall_secs", pa.float64()),
    ])


class CrawlEngine:
    def __init__(self, spark: SparkSession, store: SnapshotStore, config: CrawlConfig,
                 web_graph: DataFrame, payloads: DataFrame, robots: DataFrame | None = None):
        self.spark = spark
        self.store = store
        self.cfg = config
        self.web_graph = web_graph
        self.payloads = payloads
        self.robots_rules = (
            parse_robots_table(robots).cache() if (robots is not None and config.respect_robots) else None
        )
        self.bloom: BloomFilter | None = None
        self._round_caches: list = []
        self.last_stage_secs: dict[str, float] = {}

    # ------------------------------------------------------------- helpers
    def _t(self, name: str):
        return self.store.table(name)

    def _discovered_at(self, round_col):
        return F.timestamp_seconds(round_col.cast("long") * 60)

    def _frontier_row_cols(self):
        return ["session_id", "url", "url_hash", "host", "host_bucket", "depth",
                "priority", "parent_url", "discovered_round", "discovered_at"]

    # ------------------------------------------------------------ session
    def start_session(self, seeds: DataFrame, session_id: str | None = None) -> None:
        """Seed injection (S1/S2): depth 0, priority 1.0, round 0. Seeds
        bypass the validity regex (the reference only validates extracted
        links, CrawlerManager.java:109-120); first-wins dedup by seed order.
        May be called repeatedly with different session ids — rounds then
        schedule all sessions under the W2 quota."""
        cfg = self.cfg
        session_id = session_id or cfg.session_id
        s = seeds.select("url", "seq")
        if not cfg.reference_compat:
            s = s.withColumn("url", U.canonicalize_urls(keep_fragment=False)(F.col("url")))
        s = s.groupBy("url").agg(F.min("seq").alias("seq"))  # first seed wins
        rows = s.select(
            F.lit(session_id).alias("session_id"),
            F.col("url"),
            U.url_hash(F.col("url")).alias("url_hash"),
            U.url_host(F.col("url")).alias("host"),
            U.host_bucket(U.url_host(F.col("url")), cfg.n_host_buckets).alias("host_bucket"),
            F.lit(0).alias("depth"),
            F.lit(1.0).alias("priority"),
            F.lit(None).cast("string").alias("parent_url"),
            F.lit(0).alias("discovered_round"),
            self._discovered_at(F.lit(0)).alias("discovered_at"),
        )
        self._t("frontier").append(rows)
        if cfg.use_bloom:
            fr = self._t("frontier").read(self.spark)
            self.bloom = build_bloom(fr, "url_hash", cfg.bloom_expected_insertions, cfg.bloom_fpp)
        self._checkpoint(0)

    # ------------------------------------------------------------- views
    def pending(self) -> DataFrame:
        """PENDING = discovered but not finished. Derived latest-wins view
        over the append-only progress log (the SURVEY §7(d) shape — no
        Iceberg MERGE status flips). Keys are (session_id, url): the
        reference scopes every frontier/seen structure per session
        (URLFrontier.java:44-54).

        A URL is finished when it COMPLETED, failed permanently, or
        exhausted ``max_retries`` transient (status 0) attempts. With the
        default max_retries=0 every attempt is final — the reference's
        no-retry behavior (URLFrontier.java:198-202)."""
        fr = self._t("frontier").read(self.spark)
        pg = self._t("progress").read(self.spark)
        if pg is None:
            return fr
        done = (
            pg.groupBy("session_id", "url")
            .agg(F.count("*").alias("attempts"),
                 F.max(F.when(F.col("status") == "COMPLETED", 1).otherwise(0)).alias("completed"),
                 F.max(F.when(~F.col("retryable"), 1).otherwise(0)).alias("permanent_fail"))
            .where((F.col("completed") == 1) | (F.col("permanent_fail") == 1)
                   | (F.col("attempts") > self.cfg.max_retries))
            .select("session_id", "url")
        )
        return fr.join(done, ["session_id", "url"], "left_anti")

    # ------------------------------------------------------------- rounds
    def _schedule(self, pending: DataFrame, rnd: int) -> tuple[DataFrame, int]:
        cfg = self.cfg
        order = topk.tie_break_cols()
        if cfg.reference_compat:
            # W2 round-robin across sessions: quota = batchSize / numSessions
            # per session queue (URLFrontier.java:92-110; floor division like
            # the reference, guarded to 1 so many sessions can't deadlock).
            n_sessions = pending.select("session_id").distinct().count()
            quota = max(cfg.batch_size // max(n_sessions, 1), 1)
            sched = topk.topk_per_group(pending, ["session_id"], order, quota).drop("rk")
        else:
            # constant-fold identity windows: the frontier manifest's row
            # count (metadata, no job) upper-bounds every per-host pending
            # count, so budget >= that bound means the rank filter keeps
            # every row — skip BOTH window shuffles (drain/backfill regime)
            frontier_rows = self._t("frontier").total_rows()
            if frontier_rows is not None and cfg.budget_per_host_per_round >= frontier_rows:
                sched = pending
            else:
                sched = topk.topk_per_group_salted(
                    pending, ["session_id", "host"], order, cfg.budget_per_host_per_round,
                    n_salts=cfg.hot_host_salts, salt_source="url").drop("rk")
            if cfg.max_pages is not None:
                pg = self._t("progress").read(self.spark)
                attempted = pg.count() if pg is not None else 0
                remaining = max(cfg.max_pages - attempted, 0)
                sched = topk.global_topk(sched, order, remaining)
        # cache the ranked survivors: global_row_number's range partitioner
        # SAMPLES its input to pick bounds, and without this cache that
        # sampling job re-runs the whole anti-join + double-window pipeline
        # a second time (measured as a full extra pass over pending)
        sched = sched.cache()
        self._round_caches.append(sched)
        # deterministic global in-round sequence — computed scalably (range
        # partition + local rank + offsets), NEVER a single-partition window.
        # Its per-partition counts job doubles as the round's scheduled
        # count, so run_round never pays a separate count() action.
        meta: dict = {}
        sched = topk.global_row_number(sched, order, seq_col="sched_seq",
                                       cache_registry=self._round_caches,
                                       meta_out=meta)
        return sched.withColumn("round", F.lit(rnd)), meta["total"]

    def _gate_robots(self, sched: DataFrame) -> DataFrame:
        if self.robots_rules is None:
            return sched.withColumn("robots_allowed", F.lit(True))
        return gate_by_robots(sched, self.robots_rules, U.url_path(F.col("url")))

    def _fetch(self, allowed: DataFrame) -> DataFrame:
        """J4: the fetch equi-join against web_graph, SLIM (no payload bytes).

        Plan shape, chosen to minimize memory traffic (which is also what
        minimizes shuffle on a real cluster): the per-round scheduled set is
        bounded by the politeness budget, so it is BROADCAST into the
        web_graph scan and the 10^10-row web_graph side never shuffles.

        Spark cannot broadcast the PRESERVED side of an outer join (a
        `wg.join(broadcast(sched), "url", "right")` silently degrades to a
        SortMergeJoin that shuffles the whole web graph — verified on the
        physical plan), so outer semantics are built from two
        broadcast-friendly pieces:

            hit  = wg INNER JOIN broadcast(sched)        -- BHJ BuildRight, wg stationary
            miss = sched ANTI JOIN broadcast(hit.url)    -- small x small
            fetched = hit UNION ALL miss(null web cols)  -- every sched row survives

        The second reference to `hit` only projects `url`, so its recompute
        is a column-pruned scan (no out_links, no bytes).

        Skew note: the join key is ``url`` (unique per row), so a hot host
        cannot skew it; host-level skew lives in the scheduling window and
        is salted there (topk_per_group_salted). AQE skew-join stays on as
        the backstop.
        """
        wg = self.web_graph.select(
            F.col("url"), F.col("out_links"), F.col("image_id"),
            F.col("status_code").alias("web_status"))
        if self.cfg.fetch_join_strategy == "shuffle":
            # drain-benchmark regime: sched is frontier-sized, so a serial
            # broadcast build would dominate — one shuffled outer join
            # (hash-partitioned on url, scales with cores/executors)
            return allowed.join(wg.hint("shuffle_hash"), "url", "left")
        hit = wg.join(F.broadcast(allowed), "url")
        miss = (
            allowed.join(F.broadcast(hit.select("url")), "url", "left_anti")
            .withColumn("out_links", F.lit(None).cast("array<string>"))
            .withColumn("image_id", F.lit(None).cast("string"))
            .withColumn("web_status", F.lit(None).cast("int"))
        )
        return hit.unionByName(miss)

    def _decode_pages(self, fetched: DataFrame) -> DataFrame:
        """S5/C7: attach payload bytes and decode in Arrow batches.

        Bytes are STATIONARY: the slim scheduled rows (bounded by the
        politeness budget) are broadcast INTO the payload scan — the same
        hit/miss shape as the fetch join (J4) — so image bytes are neither
        shuffled nor broadcast. At 10^10-URL scale the payload side is
        petabytes; broadcasting it (the naive direction) is impossible, and
        shuffling it would melt the network. Decode parallelism follows the
        payload scan partitioning (`spark.sql.files.maxPartitionBytes`
        sizes it). Scheduled rows with no payload (dead link / no image)
        come back through the miss branch as status-coded page rows; the
        miss anti-join re-reads only the pruned image_id column."""
        pay = self.payloads.select(
            "image_id", F.col("bytes").alias("pbytes"), F.col("caption"), F.col("fmt"))
        slim = fetched.select(
            "session_id", "round", "sched_seq", "url", "url_hash", "host", "depth",
            "parent_url", "web_status", "image_id")
        decode = _fetch_decode_fn(self.cfg.store_page_bytes)
        if self.cfg.fetch_join_strategy == "shuffle":
            # no hint: Catalyst/AQE picks — it auto-broadcasts the payload
            # pool when it is small (keeps bytes out of the shuffle) and
            # falls back to a shuffled hash join when it is not
            joined = slim.join(pay, "image_id", "left")
            return joined.mapInPandas(decode, schema=PAGES_SCHEMA)
        hit = pay.join(F.broadcast(slim), "image_id")
        miss = (
            slim.join(F.broadcast(hit.select("url")), "url", "left_anti")
            .withColumn("pbytes", F.lit(None).cast("binary"))
            .withColumn("caption", F.lit(None).cast("string"))
            .withColumn("fmt", F.lit(None).cast("string"))
        )
        return hit.unionByName(miss).mapInPandas(decode, schema=PAGES_SCHEMA)

    def _expand(self, fetched: DataFrame, rnd: int) -> DataFrame:
        """C1/C2/C4/C5 + J1: explode out_links of ok-pages under the depth
        gate, resolve+canonicalize, validity-filter, first-wins in-round
        dedup, bloom-prefiltered exact seen anti-join."""
        cfg = self.cfg
        parents = fetched.where(
            (F.col("web_status") == 200) & (F.col("depth") < cfg.max_depth)
            & F.col("out_links").isNotNull())
        links = parents.select(
            "session_id", F.col("url").alias("parent_url"), "depth", "sched_seq",
            F.posexplode(F.col("out_links")).alias("link_idx", "href"))
        resolved = links.withColumn(
            "child_url",
            U.resolve_and_canonicalize_udf(cfg.reference_compat)(F.col("parent_url"), F.col("href")))
        valid = resolved.where(U.is_valid_url(F.col("child_url")))
        if cfg.allowed_domains and not cfg.reference_compat:
            valid = valid.where(U.url_host(F.col("child_url")).isin(cfg.allowed_domains))
        for pref in (cfg.disallowed_url_prefixes if not cfg.reference_compat else []):
            valid = valid.where(~F.col("child_url").startswith(pref))
        # first discovery wins inside the round: min by (scheduled position,
        # link position) — the reference's sequential enqueue order. Expressed
        # as min(struct(...)) so Catalyst runs a partial aggregate MAP-SIDE
        # (a window would shuffle every candidate row before deduping).
        cand = (
            valid.groupBy("session_id", "child_url")
            .agg(F.min(F.struct("sched_seq", "link_idx", "depth", "parent_url")).alias("w"))
            .select("session_id", "child_url",
                    F.col("w.depth").alias("depth"), F.col("w.parent_url").alias("parent_url"))
        )
        cand = cand.select(
            "session_id",
            F.col("child_url").alias("url"),
            U.url_hash(F.col("child_url")).alias("url_hash"),
            U.url_host(F.col("child_url")).alias("host"),
            U.host_bucket(U.url_host(F.col("child_url")), cfg.n_host_buckets).alias("host_bucket"),
            (F.col("depth") + 1).alias("depth"),
            U.child_priority(F.col("depth")).alias("priority"),
            "parent_url",
            F.lit(rnd).alias("discovered_round"),
            self._discovered_at(F.lit(rnd)).alias("discovered_at"),
        )
        # seen-set is per (session_id, url) — reference keys every structure
        # by session (URLFrontier.java:44-54). The bloom hashes the url alone:
        # a cross-session hit just routes through the exact anti-join.
        # shuffle-hash, never broadcast: the seen/frontier side GROWS every
        # round (10^10 rows at the target tier) — auto-broadcast would stall
        # the driver building a frontier-sized hash table once it crosses
        # the threshold anyway, so pin the scalable plan now
        seen = (self._t("frontier").read(self.spark)
                .select("session_id", "url").hint("shuffle_hash"))
        if cfg.use_bloom and self.bloom is not None:
            maybe = bloom_prefilter_udf(self.bloom)
            tagged = cand.withColumn("__maybe_seen", maybe(F.col("url_hash"))).cache()
            self._round_caches.append(tagged)  # unpersisted at end of round
            definitely_new = tagged.where(~F.col("__maybe_seen")).drop("__maybe_seen")
            needs_check = tagged.where(F.col("__maybe_seen")).drop("__maybe_seen")
            new_rows = definitely_new.unionByName(
                needs_check.join(seen, ["session_id", "url"], "left_anti"))
        else:
            new_rows = cand.join(seen, ["session_id", "url"], "left_anti")
        return new_rows

    def run_round(self, rnd: int) -> dict:
        t0 = time.monotonic()
        # driver-side wall per blocking stage of the round; purely
        # observational (exposed as self.last_stage_secs + stats["stage_secs"],
        # NOT part of the metrics table schema)
        stages: dict[str, float] = {}
        _last = [t0]

        def mark(name: str) -> None:
            now = time.monotonic()
            stages[name] = round(now - _last[0], 3)
            _last[0] = now

        cfg = self.cfg
        sched, n_sched = self._schedule(self.pending(), rnd)
        mark("schedule")
        if n_sched == 0:
            self._clear_round_caches()
            self.last_stage_secs = stages
            return {"round": rnd, "scheduled": 0}
        sched = sched.cache()
        self._round_caches.append(sched)

        gated = self._gate_robots(sched)
        blocked = gated.where(~F.col("robots_allowed"))
        allowed = gated.where(F.col("robots_allowed")).drop("robots_allowed")

        fetched = self._fetch(allowed).cache()   # slim: no payload bytes
        self._round_caches.append(fetched)
        pages = self._decode_pages(fetched)
        blocked_pages = blocked.select(
            "session_id", "round", "sched_seq", "url", "url_hash", "host", "depth", "parent_url",
            F.lit(403).alias("status_code"), F.lit("Blocked by robots.txt").alias("error_message"),
            F.lit(None).cast("string").alias("image_id"), F.lit(None).cast("string").alias("caption"),
            F.lit(None).cast("binary").alias("bytes"), F.lit(None).cast("string").alias("fmt"),
            F.lit(None).cast("long").alias("content_length"), F.lit(None).cast("int").alias("decoded_w"),
            F.lit(None).cast("int").alias("decoded_h"), F.lit(None).cast("long").alias("phash"),
            F.lit(0).cast("long").alias("crawl_duration_ms"), F.lit(-1).alias("partition_id"),
        )
        # the round's stats ride the pages WRITE job as observed metrics
        # (CollectMetrics in the same plan) — the former separate agg job
        # re-read the committed snapshot for numbers this job already saw
        from pyspark.sql import Observation

        obs = Observation()  # auto-named: names must be unique per session
        pages_all = pages.unionByName(blocked_pages).observe(
            obs,
            F.count(F.lit(1)).alias("scheduled"),
            F.sum(F.when(F.col("status_code") == 200, 1).otherwise(0)).alias("ok"),
            F.sum(F.when((F.col("status_code") != 200) & (F.col("status_code") != 403), 1).otherwise(0)).alias("failed"),
            F.sum(F.when(F.col("status_code") == 403, 1).otherwise(0)).alias("robots_blocked"),
            F.sum(F.coalesce(F.col("content_length"), F.lit(0))).alias("bytes_total"),
            F.avg("depth").alias("avg_depth"))
        self._t("pages").append(pages_all)
        stats_row = obs.get
        mark("fetch_decode_pages")

        new_rows = self._expand(fetched, rnd).cache()
        self._round_caches.append(new_rows)
        # the frontier append doubles as new_rows' count (parquet footer
        # metadata) — no separate count() action, no empty snapshot on
        # exhausted rounds
        fsnap, n_new = self._t("frontier").append_counted(
            new_rows.select(*self._frontier_row_cols()), skip_empty=True)
        mark("expand_frontier")
        if n_new > 0 and cfg.use_bloom and self.bloom is not None:
            # feed the bloom from the parquet the append JUST wrote —
            # a driver-side pyarrow column read, no Spark collect job
            self.bloom.add_many(self._t("frontier").read_column_local(fsnap, "url_hash"))
        mark("bloom_update")

        # every scheduled URL yields exactly one pages row with
        # status_code = web_status (0 sentinel when the fetch missed), so
        # progress projects straight off the cached slim fetch result —
        # COMPLETED on 200 else FAILED, never retried (URLFrontier.java:198-202);
        # only connection-level failures (sentinel 0) are retryable
        progress = fetched.select(
            "session_id", "url", F.col("round"),
            F.when(F.col("web_status") == 200, "COMPLETED").otherwise("FAILED").alias("status"),
            (F.coalesce(F.col("web_status"), F.lit(0)) == 0).alias("retryable"),
            F.lit("driver").alias("assigned_to"),
        ).unionByName(blocked.select(
            "session_id", "url", F.col("round"),
            F.lit("FAILED").alias("status"), F.lit(False).alias("retryable"),
            F.lit("driver").alias("assigned_to")))
        self._t("progress").append(progress)
        mark("progress_append")

        wall = time.monotonic() - t0
        stats = {"session_id": cfg.session_id, "round": rnd,
                 **{k: (int(v) if k != "avg_depth" else float(v)) for k, v in stats_row.items()},
                 "new_urls": int(n_new), "wall_secs": float(wall)}
        self._t("metrics").append_rows([stats], _metrics_schema())
        self._checkpoint(rnd)
        self._clear_round_caches()
        mark("checkpoint")
        self.last_stage_secs = stages
        return {**stats, "stage_secs": stages}

    def _clear_round_caches(self) -> None:
        for c in self._round_caches:
            c.unpersist()
        self._round_caches.clear()

    def run(self, seeds: DataFrame | None = None) -> list[dict]:
        if seeds is not None:
            self.start_session(seeds)
        start_round = (self.store.latest_checkpoint() or {"round": 0})["round"] + 1
        history = []
        # max_rounds is an ABSOLUTE round cap (not "rounds from here") so a
        # resumed run and an uninterrupted run stop at the same boundary.
        for rnd in range(start_round, self.cfg.max_rounds + 1):
            stats = self.run_round(rnd)
            if stats.get("scheduled", 0) == 0:
                break
            history.append(stats)
        return history

    # --------------------------------------------------------- checkpoints
    def _checkpoint(self, rnd: int) -> None:
        tables = {n: self._t(n).snapshot_id() for n in ("frontier", "progress", "pages", "metrics")}
        bloom_file = None
        if self.bloom is not None:
            bloom_file = f"bloom-r{rnd:05d}.bin"
            with open(os.path.join(self.store.warehouse, bloom_file), "wb") as f:
                f.write(self.bloom.to_bytes())
        self.store.write_checkpoint({"round": rnd, "tables": tables, "bloom": bloom_file})

    def resume(self) -> list[dict]:
        """Exact resume: roll every table back to the last durable checkpoint
        (discarding any torn round), reload the bloom, re-enter the loop.
        The resumed run's tables are byte-identical to an uninterrupted one
        (asserted in tests/test_resume.py)."""
        ckpt = self.store.latest_checkpoint()
        if ckpt is None:
            raise RuntimeError("no checkpoint to resume from")
        self.store.rollback_to_checkpoint(ckpt)
        if ckpt.get("bloom"):
            with open(os.path.join(self.store.warehouse, ckpt["bloom"]), "rb") as f:
                self.bloom = BloomFilter.from_bytes(f.read())
        elif self.cfg.use_bloom:
            fr = self._t("frontier").read(self.spark)
            self.bloom = build_bloom(fr, "url_hash", self.cfg.bloom_expected_insertions, self.cfg.bloom_fpp)
        return self.run()
