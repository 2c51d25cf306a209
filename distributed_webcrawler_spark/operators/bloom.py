"""Distributed Bloom filter for the URL-seen set.

The reference *declares* a 10^7-insertion / fpp-0.01 bloom filter
(application.properties:33-34, architecture.md §URL registry) but ships an
exact Redis SET (URLFrontier.java:74) — SURVEY.md §1.1. This module
implements the declared design the Spark way:

- per-partition bitarray build (numpy, over Arrow batches / iterators),
- OR-merge via ``RDD.treeAggregate`` (depth 2 -> log-tree combine instead
  of hauling every partition's bits to the driver),
- double hashing h_i = h1 + i*h2 (Kirsch-Mitzenmacher) over the already
  computed xxhash64 url_hash, so membership tests are pure int math.

CORRECTNESS CONTRACT (SURVEY.md §7b): the bloom is ONLY a prefilter. A
candidate that misses the bloom is *definitely new* and skips the exact
anti-join; a candidate that hits may be a false positive and MUST go
through the authoritative full-string anti-join. No URL can be dropped by
a bloom false positive, and bloom false negatives are impossible.

Scale: at 10^10 URLs / fpp 0.01 the bits are ~12 GB — too big for one
filter; production would shard the bloom by host_bucket (one filter per
bucket, built per partition, merged per bucket). The API takes n/fpp so
tests exercise the same code at small n.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_CHUNK = 1 << 18  # insert-kernel chunk: position buffer = 256k x k x 8B (~14MB at k=7)


class BloomFilter:
    # class-level scratch, keyed by (n_bits, n_hashes): the insert kernel's
    # working buffers are faulted ONCE per process and reused across calls,
    # instances, and (in reused Python UDF workers) across tasks. Fresh
    # multi-hundred-MB numpy temporaries per call would re-pay soft page
    # faults every round — ~400us/page on virtualized hosts (measured 23s
    # vs 0.1s for one 224MB temporary on this sandbox).
    _scratch: dict = {}

    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = bits if bits is not None else np.zeros((n_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def for_capacity(cls, expected_insertions: int, fpp: float) -> "BloomFilter":
        n = max(expected_insertions, 1)
        m = max(8, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        return cls(m, k)

    # -- vectorized int-hash membership --------------------------------
    @staticmethod
    def _mix(h: np.ndarray) -> np.ndarray:
        """splitmix64 finalizer — makes positions uniform even for poorly
        distributed inputs (sequential ids, biased hashes)."""
        with np.errstate(over="ignore"):
            h = (h + np.uint64(0x9E3779B97F4A7C15))
            h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return h ^ (h >> np.uint64(31))

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(n,) int64 -> (n, k) bit positions via double hashing
        (Kirsch-Mitzenmacher) over two independently mixed 64-bit values."""
        h = self._mix(hashes.astype(np.uint64))
        h1 = h % np.uint64(self.n_bits)
        h2 = (self._mix(h) | np.uint64(1)) % np.uint64(self.n_bits)
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.n_bits)).astype(np.int64)

    def _bufs(self) -> dict:
        key = (self.n_bits, self.n_hashes)
        b = BloomFilter._scratch.get(key)
        if b is None:
            # single-slot cache: the dense bool array is n_bits BYTES (~96MB
            # at the 1e7/0.01 default) and reused Python UDF workers live for
            # the whole app — keeping one entry per (n_bits, n_hashes) would
            # pin gigabytes of RSS across tens of workers
            BloomFilter._scratch.clear()
            b = {
                "h": np.empty(_CHUNK, dtype=np.uint64),
                "t": np.empty(_CHUNK, dtype=np.uint64),
                "h1": np.empty(_CHUNK, dtype=np.uint64),
                "pos": np.empty((_CHUNK, self.n_hashes), dtype=np.uint64),
                "i": np.arange(self.n_hashes, dtype=np.uint64),
                "dense": (np.zeros(self.n_bits, dtype=bool)
                          if self.n_bits <= (1 << 31) else None),
            }
            BloomFilter._scratch[key] = b
        return b

    @staticmethod
    def _mix_inplace(h: np.ndarray, t: np.ndarray) -> None:
        """splitmix64 finalizer, in-place (identical math to _mix)."""
        with np.errstate(over="ignore"):
            h += np.uint64(0x9E3779B97F4A7C15)
            np.right_shift(h, np.uint64(30), out=t)
            h ^= t
            h *= np.uint64(0xBF58476D1CE4E5B9)
            np.right_shift(h, np.uint64(27), out=t)
            h ^= t
            h *= np.uint64(0x94D049BB133111EB)
            np.right_shift(h, np.uint64(31), out=t)
            h ^= t

    def add_many(self, hashes: np.ndarray) -> None:
        """Chunked, buffer-reusing insert. Positions are computed in-place
        into class-level scratch (see _scratch note) and scattered into a
        reusable dense boolean array, then packbits-OR'd into the bits —
        boolean scatter-assign tolerates duplicates, so there is no
        read-modify-write hazard, and it is ~90x faster than
        np.bitwise_or.at (an unbuffered ufunc, ~0.3M positions/s). Filters
        >256MB of bits (none at our shard sizes — the 10^10 tier shards by
        host_bucket) fall back to the ufunc per chunk."""
        n = len(hashes)
        if n == 0:
            return
        b = self._bufs()
        dense = b["dense"]
        nb = np.uint64(self.n_bits)
        src = hashes.view(np.uint64) if hashes.dtype == np.int64 else hashes.astype(np.uint64)
        if dense is not None:
            dense[:] = False
        for s in range(0, n, _CHUNK):
            e = min(s + _CHUNK, n)
            m = e - s
            h, t, h1 = b["h"][:m], b["t"][:m], b["h1"][:m]
            pos = b["pos"][:m]
            h[:] = src[s:e]
            self._mix_inplace(h, t)          # h = mix(raw)
            np.mod(h, nb, out=h1)            # h1
            self._mix_inplace(h, t)          # mix again for h2
            h |= np.uint64(1)
            np.mod(h, nb, out=h)             # h = h2
            with np.errstate(over="ignore"):
                np.multiply(h[:, None], b["i"][None, :], out=pos)
                pos += h1[:, None]
            np.mod(pos, nb, out=pos)
            flat = pos.reshape(-1)
            if dense is not None:
                dense[flat] = True
            else:
                np.bitwise_or.at(self.bits, (flat >> np.uint64(3)).astype(np.int64),
                                 (np.uint64(1) << (flat & np.uint64(7))).astype(np.uint8))
        if dense is not None:
            np.bitwise_or(self.bits, np.packbits(dense, bitorder="little")[: self.bits.size],
                          out=self.bits)

    def might_contain_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        present = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return present.all(axis=1)

    def union(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
        return BloomFilter(self.n_bits, self.n_hashes, np.bitwise_or(self.bits, other.bits))

    # -- (de)serialization for checkpoint manifests ---------------------
    def to_bytes(self) -> bytes:
        head = self.n_bits.to_bytes(8, "little") + self.n_hashes.to_bytes(4, "little")
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        n_bits = int.from_bytes(data[:8], "little")
        n_hashes = int.from_bytes(data[8:12], "little")
        return cls(n_bits, n_hashes, np.frombuffer(data[12:], dtype=np.uint8).copy())


def build_bloom(df: DataFrame, hash_col: str, expected_insertions: int, fpp: float,
                tree_depth: int = 2, max_build_partitions: int = 32) -> BloomFilter:
    """Distributed build: per-partition bitarrays over Arrow batches
    (mapInPandas — NOT `.rdd`, which row-pickles every value JVM->Python),
    then a treeReduce OR-merge of the per-partition filters.

    Bit-OR is associative+commutative, so the log-tree combine is exact.
    Partition count is capped: each partition yields one n_bits-sized blob,
    so fewer/larger build partitions means less merge traffic. At the
    10^10 tier the filter would be sharded by host_bucket (one filter per
    bucket) rather than one global bitarray — same code per shard.
    """
    proto = BloomFilter.for_capacity(expected_insertions, fpp)
    merged = _distributed_or_merge(df, hash_col, proto.n_bits, proto.n_hashes,
                                   max_build_partitions, tree_depth)
    return merged if merged is not None else proto


def _partition_filter_fn(n_bits: int, n_hashes: int):
    def per_partition(it):
        bf = BloomFilter(n_bits, n_hashes)
        got = False
        for pdf in it:
            vals = pdf.iloc[:, 0].dropna().to_numpy(dtype=np.int64)
            if len(vals):
                bf.add_many(vals)
                got = True
        if got:
            yield pd.DataFrame({"blob": [bf.to_bytes()]})

    return per_partition


def _distributed_or_merge(df: DataFrame, hash_col: str, n_bits: int, n_hashes: int,
                          max_parts: int, tree_depth: int) -> BloomFilter | None:
    """Per-partition filters + treeReduce OR-merge, computed EXACTLY ONCE.

    The blob RDD is persisted before the emptiness probe — an unpersisted
    RDD would re-run the whole per-partition hash+serialize pipeline a
    second time inside treeReduce (measured as a full extra pass over the
    round's candidates). Partition count is capped so merge traffic is
    bounded at max_parts × (n_bits/8) bytes regardless of input layout."""
    slim = df.select(hash_col)
    n_parts = slim.rdd.getNumPartitions()
    if n_parts > max_parts:
        slim = slim.coalesce(max_parts)
        n_parts = max_parts
    blob_df = slim.mapInPandas(_partition_filter_fn(n_bits, n_hashes), "blob binary")
    if n_parts <= 64:
        # few blobs: ONE job, collect and OR on the driver (numpy OR of
        # <=64 x n_bits/8 bytes is microseconds — the treeReduce machinery
        # would pickle every filter through Python RDD shuffles for nothing)
        rows = blob_df.collect()
        if not rows:
            return None
        out = BloomFilter(n_bits, n_hashes)
        for r in rows:
            np.bitwise_or(out.bits, np.frombuffer(bytes(r.blob)[12:], dtype=np.uint8),
                          out=out.bits)
        return out
    # many blobs (10^10-tier sharded builds): log-tree OR-merge on executors
    blobs = blob_df.rdd.map(lambda r: BloomFilter.from_bytes(bytes(r.blob)))
    from pyspark import StorageLevel

    blobs.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if blobs.isEmpty():
            return None
        return blobs.treeReduce(lambda a, b: a.union(b), depth=tree_depth)
    finally:
        blobs.unpersist()


def add_hashes(bloom: BloomFilter, df: DataFrame, hash_col: str,
               distributed_threshold: int = 5_000_000, n_rows: int | None = None) -> None:
    """Incremental update after a round. Two regimes:

    - small-to-medium rounds: pull ONLY the 8-byte hashes to the driver
      (Arrow) and add them — with the packbits scatter a few million hashes
      set in <0.5s, far cheaper than collecting per-partition blobs
      (max_parts x filter-size bytes through the driver),
    - huge rounds (>= distributed_threshold new URLs): build per-partition
      delta filters of the SAME dimensions executor-side (mapInPandas),
      OR-merge them, and OR the delta into `bloom` — the driver only
      merges bit arrays.

    Pass ``n_rows`` when the caller already counted df (saves a job).
    """
    n = df.count() if n_rows is None else n_rows
    if n >= distributed_threshold:
        delta = _distributed_or_merge(df, hash_col, bloom.n_bits, bloom.n_hashes,
                                      max_parts=32, tree_depth=2)
        if delta is not None:
            np.bitwise_or(bloom.bits, delta.bits, out=bloom.bits)
        return
    pdf = df.select(hash_col).toPandas()
    vals = pdf.iloc[:, 0].dropna().to_numpy(dtype=np.int64)
    if len(vals):
        bloom.add_many(vals)


class ShardedBloomStore:
    """The 10^10-tier bloom lifecycle: ONE filter per host_bucket shard,
    built and updated EXECUTOR-SIDE, persisted as versioned per-shard blob
    files under a shared directory (the warehouse locally; an object store
    on a real cluster). The driver never materializes a filter — it only
    tracks the {shard: version} manifest (a dict of ints), so driver memory
    is O(n_shards), not O(total bits): at 10^10 insertions / fpp 0.01 the
    global filter is ~12 GB, while a 256-shard store is ~47 MB per shard
    and every build/update/prefilter touches shards partition-parallel.

    Write protocol: each applyInPandas group task builds its shard's delta
    bitarray, ORs it with the shard's previous version file (if any), and
    os.replace()s a tmp file into `shard-SSSS-vVVVVVV.bin` — versioned
    names mean a reader holding an older manifest never observes a torn
    or half-updated filter (same idea as the SnapshotStore commit
    protocol). Old versions are pruned two checkpoints back by the caller.

    Correctness contract is unchanged from the global filter: shard miss =
    definitely new; shard hit MUST still pass the exact anti-join.
    """

    def __init__(self, directory: str, n_shards: int, n_bits_per_shard: int,
                 n_hashes: int, versions: dict | None = None):
        import os

        self.directory = directory
        self.n_shards = n_shards
        self.n_bits = n_bits_per_shard
        self.n_hashes = n_hashes
        # {shard_id: version}; a shard absent here has no filter yet (reads
        # as "maybe new" = definitely-new via empty filter semantics)
        self.versions: dict[int, int] = dict(versions or {})
        os.makedirs(directory, exist_ok=True)

    @classmethod
    def for_capacity(cls, directory: str, n_shards: int,
                     expected_insertions_total: int, fpp: float) -> "ShardedBloomStore":
        proto = BloomFilter.for_capacity(
            max(expected_insertions_total // max(n_shards, 1), 1), fpp)
        return cls(directory, n_shards, proto.n_bits, proto.n_hashes)

    @staticmethod
    def shard_path(directory: str, shard: int, version: int) -> str:
        import os

        return os.path.join(directory, f"shard-{shard:05d}-v{version:08d}.bin")

    def update(self, df: DataFrame, hash_col: str, shard_col: str,
               version: int) -> list[int]:
        """Executor-side build/update: group rows by shard, each group task
        folds its hashes into (previous version OR delta) and commits
        `shard-k-v<version>.bin`. Returns the shard ids written; shards
        with no rows this round keep their old version. Idempotent per
        (data, version) — re-running a torn round overwrites the same
        version files with identical bytes (exact-resume safe)."""
        directory, n_bits, n_hashes = self.directory, self.n_bits, self.n_hashes
        prev = dict(self.versions)

        def per_shard(key, pdf):
            import os
            import tempfile

            shard = int(key[0])
            bf = BloomFilter(n_bits, n_hashes)
            pv = prev.get(shard)
            if pv is not None:
                with open(ShardedBloomStore.shard_path(directory, shard, pv), "rb") as f:
                    bf = BloomFilter.from_bytes(f.read())
            vals = pdf[hash_col].dropna().to_numpy(dtype=np.int64)
            bf.add_many(vals)
            fd, tmp = tempfile.mkstemp(dir=directory, suffix=".bloom.tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(bf.to_bytes())
            os.replace(tmp, ShardedBloomStore.shard_path(directory, shard, version))
            return pd.DataFrame({"shard": [shard], "n": [len(vals)]})

        out = (df.select(F.col(shard_col).alias("__shard"), F.col(hash_col))
                 .groupBy("__shard")
                 .applyInPandas(per_shard, "shard int, n long")
                 .collect())
        written = [int(r.shard) for r in out]
        for s in written:
            self.versions[s] = version
        return written

    def prefilter_udf(self):
        """(hash, shard) -> bool pandas UDF. Each worker lazily opens ONLY
        the shard files its partitions reference (repartition the candidate
        set by the shard column first so a task touches exactly one shard),
        cached per (shard, version) with a small LRU so long-lived workers
        stay bounded."""
        from pyspark.sql.functions import pandas_udf

        directory = self.directory
        versions = dict(self.versions)
        n_bits, n_hashes = self.n_bits, self.n_hashes
        cache: dict = {}

        def _get(shard: int) -> BloomFilter | None:
            v = versions.get(shard)
            if v is None:
                return None
            key = (shard, v)
            bf = cache.get(key)
            if bf is None:
                if len(cache) >= 8:  # bound worker RSS to a few shards
                    cache.pop(next(iter(cache)))
                with open(ShardedBloomStore.shard_path(directory, shard, v), "rb") as f:
                    bf = cache[key] = BloomFilter.from_bytes(f.read())
            return bf

        @pandas_udf("boolean")
        def _might_contain(hashes: pd.Series, shards: pd.Series) -> pd.Series:
            out = np.zeros(len(hashes), dtype=bool)
            hv = hashes.fillna(0).to_numpy(dtype=np.int64)
            sv = shards.fillna(-1).to_numpy(dtype=np.int64)
            for shard in np.unique(sv):
                bf = _get(int(shard))
                if bf is None:
                    continue  # no filter yet -> definitely new
                m = sv == shard
                out[m] = bf.might_contain_many(hv[m])
            return pd.Series(out)

        return _might_contain

    def prune_versions(self, keep_from: dict) -> None:
        """Delete blob files older than `keep_from[shard]` (the previous
        checkpoint's versions) — called after a checkpoint commits."""
        import os

        for f in os.listdir(self.directory):
            if not f.startswith("shard-") or not f.endswith(".bin"):
                continue
            shard, ver = int(f[6:11]), int(f[13:21])
            if ver < keep_from.get(shard, 0):
                os.unlink(os.path.join(self.directory, f))


def bloom_prefilter_udf(bloom: BloomFilter):
    """Series->Series pandas UDF: might_contain over Arrow batches. The
    filter bytes ship to executors once via closure broadcast."""
    from pyspark.sql.functions import pandas_udf

    blob = bloom.to_bytes()
    memo: dict = {}  # per-worker: deserialize the bit array ONCE per task,
    # not once per Arrow batch (the filter is MBs; a per-batch copy would
    # memcpy gigabytes across a large round)

    @pandas_udf("boolean")
    def _might_contain(hashes: pd.Series) -> pd.Series:
        bf = memo.get("bf")
        if bf is None:
            bf = memo["bf"] = BloomFilter.from_bytes(blob)
        vals = hashes.fillna(0).to_numpy(dtype=np.int64)
        return pd.Series(bf.might_contain_many(vals))

    return _might_contain
