"""Bounded-state sketches for 100 TB-scale corpus statistics:

- KMV (k minimum values) distinct-count sketch — Bar-Yossef et al.,
  "Counting distinct elements in a data stream" (RANDOM 2002), public
  literature: keep the k smallest distinct hash values; if the k-th
  smallest normalized hash is h, the distinct estimate is (k-1)/h.
- HyperLogLog distinct sketch — Flajolet, Fusy, Gandouet, Meunier
  (AofA 2007): m = 2^p registers each holding the max leading-zero rank
  of the hashes routed to them; constant-width mergeable state (256
  bytes at p=8), the gauge the reference's declared-but-unimplemented
  bloom sizing (application.properties:33-34) never had.
- Deterministic weighted sampling (A-Res) — Efraimidis & Spirakis,
  "Weighted random sampling with a reservoir" (IPL 2006): key_i =
  u_i^(1/w_i) with u_i uniform(0,1); the k largest keys are a weighted
  sample without replacement.

Both use the portable md5-derived 60-bit hash (functions/hashes.py) as the
randomness source, so results are exactly reproducible across engines and
runs — the property the DuckDB oracle gate and the engine's byte-identical
resume both need. (A production variant would swap in xxhash64 for speed;
semantics are identical.)

Scale shapes:
- KMV's whole point is BOUNDED state: a mapPartitions pass keeps only the
  k smallest unique hashes per partition (k values of state, no shuffle of
  the column), then the global k smallest of those n_partitions*k
  survivors are selected with orderBy+limit (TakeOrderedAndProject). The
  per-partition prune is lossless for the final answer: the global k
  smallest distinct hashes each are among their own partition's k
  smallest.
- A-Res is one map-side key computation + one TakeOrderedAndProject: no
  shuffle, no global sort, state bounded at k per partition heap.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import h64, h64_sql

_H_SPACE = float(1 << 60)  # h64 is uniform on [0, 2^60)


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame (k_used, kth_hash, est_distinct): the KMV distinct
    estimate of ``col``. If fewer than k distinct hashes exist the estimate
    is the exact distinct count (the sketch is lossless below k)."""

    def partition_topk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        heap: list[int] = []          # max-heap of negated hashes, size <= k
        members: set[int] = set()
        for pdf in it:
            for h in pdf["h"]:
                h = int(h)
                if h in members:
                    continue
                if len(heap) < k:
                    heapq.heappush(heap, -h)
                    members.add(h)
                elif h < -heap[0]:
                    members.discard(-heapq.heappushpop(heap, -h))
                    members.add(h)
        yield pd.DataFrame({"h": pd.array(sorted(members), dtype="Int64")})

    hashed = df.select(h64(col).alias("h"))
    survivors = hashed.mapInPandas(partition_topk, "h long")
    # <= k*n_partitions rows reach here; dedup across partitions FIRST
    # (a hash present in two partitions must not occupy two of the global
    # k slots), then TakeOrderedAndProject picks the k smallest
    merged = survivors.distinct().orderBy("h").limit(k)
    scale = float(k - 1) * _H_SPACE
    return (merged.agg(F.count("*").alias("k_used"), F.max("h").alias("kth_hash"))
                  .select("k_used", "kth_hash",
                          F.round(
                              F.when(F.col("k_used") < k,
                                     F.col("k_used").cast("double"))
                               .otherwise(F.lit(scale) / F.col("kth_hash")),
                              4).alias("est_distinct")))


def kmv_distinct_sql(expr: str, source: str, k: int = 256) -> str:
    """DuckDB restatement: the global k smallest distinct hashes directly
    (the per-partition prune is lossless, so the sketch equals this)."""
    scale = float(k - 1) * _H_SPACE
    return f"""
WITH hashes AS (SELECT DISTINCT {h64_sql(expr)} AS h FROM {source}),
smallest AS (SELECT h FROM hashes ORDER BY h LIMIT {k})
SELECT cast(count(*) as bigint) AS k_used, max(h) AS kth_hash,
       round(CASE WHEN count(*) < {k} THEN cast(count(*) as double)
                  ELSE {scale!r} / max(h) END, 4) AS est_distinct
FROM smallest
"""


def hll_registers(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """HyperLogLog register table for ``col``: (register int, max_rho int),
    occupied registers only. register = h % m, rho = (61-p) - bitlen(h >> p)
    (h is the 60-bit portable hash, so the rank field is 60 - p bits wide
    for ANY p; p=8 gives the standard 52-bit field and rho_max = 53).
    One groupBy(register) with map-side partial max — constant 2^p-row
    state per partition, mergeable across rounds/checkpoints exactly like
    the bloom shards.

    Everything is integer arithmetic: w = shiftright(h, p) — NOT float
    division, which differs from exact integer `//` for h > 2^53 — and
    bitlen via the unpadded base-2 string (the same trick DuckDB's bin()
    allows), so two engines agree bit-for-bit — no float enters until
    the estimate."""
    m = 1 << p
    rho_max = 61 - p  # w == 0 ⇒ all (60-p) field bits are zero ⇒ rho = field+1
    h = h64(col)
    return (df.select(F.pmod(h, F.lit(m)).cast("int").alias("register"),
                      F.shiftright(h, p).alias("w"))
            .select("register",
                    F.when(F.col("w") == 0, F.lit(rho_max))
                    .otherwise(F.lit(rho_max) - F.length(
                        F.conv(F.col("w").cast("string"), 10, 2)))
                    .cast("int").alias("rho"))
            .groupBy("register").agg(F.max("rho").cast("int").alias("max_rho")))


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One-row (hll_estimate double) from a register table. The harmonic
    sum is the EXACT integer Σ 2^(rho_max - max_rho) with rho_max = 61-p
    (empty registers contribute 2^(61-p) each; max 2^p·2^(61-p) = 2^61
    < 2^63 for any p), so the only float operations are one multiply
    chain and one division — identical IEEE on any engine. Includes the
    standard small-range correction E = m·ln(m/V)."""
    m = 1 << p
    rho_max = 61 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    two_field = 1 << rho_max  # 2^(61-p); 2^53 at the default p=8
    summ = registers.agg(
        F.sum(F.expr(
            f"shiftleft(cast(1 as bigint), {rho_max} - max_rho)")).alias("s_occ"),
        F.count("*").alias("n_occ"),
    ).select(
        (F.col("s_occ") + (F.lit(m) - F.col("n_occ")) * F.lit(two_field)).alias("s_int"),
        (F.lit(m) - F.col("n_occ")).cast("bigint").alias("v_empty"),
    )
    raw = (F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(two_field))) / F.col("s_int")
    est = F.round(
        F.when((F.col("v_empty") > 0) & (raw <= F.lit(2.5 * m)),
               F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_empty")))
        .otherwise(raw), 4)
    return summ.select(est.alias("hll_estimate"))


def binned_quantiles(df: DataFrame, col: str, bin_width: float,
                     qs: list[tuple[str, float]]) -> DataFrame:
    """Approximate quantiles from a fixed-width histogram: (label, q,
    est_value) per requested quantile. The 10^10-row path for exact
    `percentile`'s global sort: one groupBy(bin) with map-side partial
    counts (shuffle width = #bins, a constant of the value range, not of
    the row count; mergeable across rounds like every sketch here), then
    linear interpolation inside the bin where the cumulative count
    crosses q·n. Max error is bin_width/2 per estimate, chosen by the
    caller. The cumulative window runs over the BIN dimension (bounded,
    ordered) — the same bounded-dimension window pattern as the depth
    profile, not a global sort over rows.

    Determinism: bin ids and cumulative counts are exact integers; the
    only float ops are floor(x/W) per row and one interpolation per
    quantile — identical IEEE on both engines."""
    bins = (df.select(F.floor(F.col(col) / F.lit(bin_width)).cast("bigint").alias("bin"))
            .groupBy("bin").agg(F.count("*").alias("cnt")))
    from pyspark.sql import Window
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select("bin", "cnt", F.sum("cnt").over(w).alias("cum"))
    tot = bins.agg(F.sum("cnt").alias("n"))
    qdim = tot.select(
        "n",
        F.explode(F.array(*[
            F.struct(F.lit(label).alias("label"), F.lit(q).alias("q"))
            for label, q in qs])).alias("s")).select("n", "s.label", "s.q")
    cand = (cum.crossJoin(F.broadcast(qdim))
            .where(F.col("cum") >= F.col("q") * F.col("n")))
    wq = Window.partitionBy("label").orderBy("bin")
    first = (cand.withColumn("rk", F.row_number().over(wq))
             .where(F.col("rk") == 1))
    est = (F.col("bin") * F.lit(bin_width)
           + F.lit(bin_width) * (F.col("q") * F.col("n")
                                 - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
    return first.select("label", "q", F.round(est, 6).alias("est_value"))


def binned_quantiles_sql(expr: str, source: str, bin_width: float,
                         qs: list[tuple[str, float]]) -> str:
    """DuckDB restatement of :func:`binned_quantiles` (same bins, same
    cumulative crossing, same interpolation — value-identical)."""
    qrows = ", ".join(f"('{label}', {q!r}::DOUBLE)" for label, q in qs)
    return f"""
WITH bins AS (
  SELECT cast(floor(({expr}) / {bin_width!r}) as bigint) AS bin, count(*) AS cnt
  FROM {source} GROUP BY 1),
cum AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM bins),
tot AS (SELECT sum(cnt) AS n FROM bins),
qdim AS (SELECT * FROM (VALUES {qrows}) v(label, q)),
cand AS (
  SELECT q.label, q.q, c.bin, c.cnt, c.cum, t.n,
         row_number() OVER (PARTITION BY q.label ORDER BY c.bin) AS rk
  FROM cum c CROSS JOIN qdim q CROSS JOIN tot t
  WHERE c.cum >= q.q * t.n)
SELECT label, q,
       round(bin * {bin_width!r} + {bin_width!r} * (q * n - (cum - cnt)) / cnt, 6) AS est_value
FROM cand WHERE rk = 1
"""


def binned_quantiles_by(df: DataFrame, col: str, group_col: str,
                        bin_width: float,
                        qs: list[tuple[str, float]]) -> DataFrame:
    """Grouped :func:`binned_quantiles`: (group, label, q, est_value) —
    per-group approximate quantiles from one shared histogram pass. The
    shuffle is (group × bins) wide, the cumulative window is per group
    over the bounded bin dimension, and the crossing pick is a per-
    (group, label) rank window — no per-group sort of rows anywhere,
    which is the entire point at 10^10 rows × 10^4 groups."""
    from pyspark.sql import Window
    bins = (df.select(F.col(group_col).alias("grp"),
                      F.floor(F.col(col) / F.lit(bin_width)).cast("bigint")
                      .alias("bin"))
            .groupBy("grp", "bin").agg(F.count("*").alias("cnt")))
    w = (Window.partitionBy("grp").orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = bins.select("grp", "bin", "cnt", F.sum("cnt").over(w).alias("cum"))
    tot = bins.groupBy("grp").agg(F.sum("cnt").alias("n"))
    qdim = tot.select(
        "grp", "n",
        F.explode(F.array(*[
            F.struct(F.lit(label).alias("label"), F.lit(q).alias("q"))
            for label, q in qs])).alias("s")).select("grp", "n", "s.label", "s.q")
    cand = (cum.join(qdim, "grp")
            .where(F.col("cum") >= F.col("q") * F.col("n")))
    wq = Window.partitionBy("grp", "label").orderBy("bin")
    first = (cand.withColumn("rk", F.row_number().over(wq))
             .where(F.col("rk") == 1))
    est = (F.col("bin") * F.lit(bin_width)
           + F.lit(bin_width) * (F.col("q") * F.col("n")
                                 - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
    return first.select(F.col("grp").alias(group_col), "label", "q",
                        F.round(est, 6).alias("est_value"))


def binned_quantiles_by_sql(expr: str, group_expr: str, source: str,
                            bin_width: float,
                            qs: list[tuple[str, float]]) -> str:
    """DuckDB restatement of :func:`binned_quantiles_by`."""
    qrows = ", ".join(f"('{label}', {q!r}::DOUBLE)" for label, q in qs)
    return f"""
WITH bins AS (
  SELECT {group_expr} AS grp, cast(floor(({expr}) / {bin_width!r}) as bigint) AS bin,
         count(*) AS cnt
  FROM {source} GROUP BY 1, 2),
cum AS (
  SELECT grp, bin, cnt,
         sum(cnt) OVER (PARTITION BY grp ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM bins),
tot AS (SELECT grp, sum(cnt) AS n FROM bins GROUP BY grp),
qdim AS (SELECT * FROM (VALUES {qrows}) v(label, q)),
cand AS (
  SELECT c.grp, q.label, q.q, c.bin, c.cnt, c.cum, t.n,
         row_number() OVER (PARTITION BY c.grp, q.label ORDER BY c.bin) AS rk
  FROM cum c JOIN tot t ON t.grp = c.grp CROSS JOIN qdim q
  WHERE c.cum >= q.q * t.n)
SELECT grp, label, q,
       round(bin * {bin_width!r} + {bin_width!r} * (q * n - (cum - cnt)) / cnt, 6) AS est_value
FROM cand WHERE rk = 1
"""


def weighted_sample(df: DataFrame, weight_col, k: int = 100,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic Efraimidis-Spirakis weighted sample WITHOUT
    replacement: key = u^(1/w) with u = h64(id)/2^60; keep the k largest
    keys. ``weight_col`` is any positive numeric Column/name. The key is
    rounded to 12 on both engines (libm pow can differ in the last ulp);
    ties break to the smaller id. Returns (id, weight, key)."""
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast("double")
    u = h64(F.col(id_col).cast("string")).cast("double") / F.lit(_H_SPACE)
    key = F.round(F.pow(u, F.lit(1.0) / w), 12)
    return (df.select(F.col(id_col).alias("id"), w.alias("weight"), key.alias("key"))
              .orderBy(F.col("key").desc(), F.col("id").asc())
              .limit(k))


def weighted_sample_sql(id_expr: str, weight_expr: str, source: str,
                        k: int = 100) -> str:
    """DuckDB restatement with identical arithmetic and rounding."""
    return f"""
SELECT {id_expr} AS id, cast({weight_expr} as double) AS weight,
       round(pow(cast({h64_sql(f'cast({id_expr} as varchar)')} as double) / {_H_SPACE!r},
                 1.0 / cast({weight_expr} as double)), 12) AS key
FROM {source}
ORDER BY key DESC, id ASC
LIMIT {k}
"""


def cms_heavy_hitters(df: DataFrame, key_col: str, d: int = 3, w: int = 64,
                      k: int = 20) -> DataFrame:
    """Count-min-sketch heavy hitters — Cormode & Muthukrishnan, "An improved
    data stream summary: the count-min sketch and its applications"
    (J. Algorithms 2005). The sketch is a d x w counter matrix; row j counts
    events in bucket h_j(key) % w; the estimate for a key is the MIN over
    its d buckets. Estimates never undercount (est >= exact); the expected
    overcount is N/w per row, and min-over-d makes all d rows collide the
    same way before an estimate inflates.

    Spark restatement with the right scale shape:
    - the sketch build is ONE projection (d (j, bucket) structs per row,
      in-row explode) + a groupBy(j, bucket) count. Partial aggregation
      caps what each task emits at d*w rows, so the shuffle carries
      O(d * w * n_partitions) counters regardless of input rows —
      the mergeability that makes CMS a 100 TB operator.
    - candidate keys come from a distinct over the key column (fine for
      bounded key domains like hosts/event types; a true streaming top-k
      pairs the sketch with a per-partition candidate heap instead).
    - each candidate joins the d x w sketch (broadcast — it is tiny by
      construction) and takes min(counter) as its estimate.
    - final top-k is orderBy+limit = TakeOrderedAndProject, never a
      global sort.

    Buckets use the portable md5-derived h64 ("<j>:<key>"), so the DuckDB
    oracle rebuilds the identical sketch. Returns top-k
    (key, est_count, exact_count, overcount) by est DESC, key ASC;
    overcount >= 0 by the CMS guarantee — the oracle gate would catch an
    undercounting bucket hash on either engine.
    """
    def jb(key):  # d (j, bucket) structs for one key Column, exploded
        return F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                F.pmod(h64(F.concat(F.lit(f"{j}:"), key)), F.lit(w))
                 .cast("int").alias("b"))
            for j in range(d)
        ])).alias("jb")

    key = F.col(key_col).cast("string")
    sketch = (df.select(jb(key)).select("jb.j", "jb.b")
                .groupBy("j", "b").agg(F.count("*").alias("c")))

    exact = df.groupBy(key.alias("key")).agg(F.count("*").alias("exact_count"))
    cand = exact.select("key", "exact_count", jb(F.col("key"))).select(
        "key", "exact_count", "jb.j", "jb.b")
    est = (cand.join(F.broadcast(sketch), ["j", "b"])
               .groupBy("key", "exact_count")
               .agg(F.min("c").alias("est_count")))
    return (est.select("key", "est_count", "exact_count",
                       (F.col("est_count") - F.col("exact_count")).alias("overcount"))
               .orderBy(F.col("est_count").desc(), F.col("key").asc())
               .limit(k))


def cms_heavy_hitters_sql(key_expr: str, source: str, d: int = 3, w: int = 64,
                          k: int = 20) -> str:
    """DuckDB restatement: identical hash, buckets, min-over-d, ordering."""
    js = ", ".join(f"({j})" for j in range(d))
    kx = f"cast({key_expr} as varchar)"
    row_bucket = h64_sql(f"concat(j, ':', {kx})")
    b = f"{row_bucket} % {w}"
    return f"""
WITH sketch AS (
  SELECT j, {b} AS b, count(*) AS c
  FROM {source} CROSS JOIN (VALUES {js}) AS depths(j)
  GROUP BY 1, 2
),
exact AS (
  SELECT {kx} AS key, count(*) AS exact_count FROM {source} GROUP BY 1
),
est AS (
  SELECT e.key, e.exact_count, min(s.c) AS est_count
  FROM exact e CROSS JOIN (VALUES {js}) AS depths(j)
  JOIN sketch s ON s.j = depths.j
    AND s.b = {h64_sql("concat(depths.j, ':', e.key)")} % {w}
  GROUP BY 1, 2
)
SELECT key, est_count, exact_count, est_count - exact_count AS overcount
FROM est ORDER BY est_count DESC, key ASC LIMIT {k}
"""
