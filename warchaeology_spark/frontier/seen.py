"""URL-seen set: exact hash table + partitioned bloom pre-filter (SURVEY §4.2 #1).

The reference's semantic ancestor is the Badger DigestIndex — an atomic
read-or-insert keyed on digest (/root/reference/internal/index/
digestindex.go:45-68). At 10^10 keys a single-node LSM (or a single
driver-side bloom: ~12 GB at 1% fpp) cannot work; the Spark-native design:

- **exact seen** — a DataFrame/table ``seen(url_hash, surt, url_canon)``
  hash-partitioned on ``pmod(url_hash, P)``. Membership is a left-anti
  join; this is the *source of truth*, so frontier parity is exact and a
  bloom false positive can never lose a URL.
- **partitioned bloom** — ``bloom(pid, bitset binary)``, one bitset per
  hash partition, each sized for total_expected/P keys. Candidates are
  tested *co-grouped by pid* (cogroup + applyInPandas: the bitset crosses
  the wire once per partition, never once per row) with vectorized numpy
  double-hashing (h1 + i*h2, the standard Kirsch-Mitzenmacher scheme).
  Definitely-new candidates (bloom miss) skip the exact anti-join
  entirely; only "maybe seen" rows (true hits + fpp) pay the join. At a
  steady-state crawl where most discovered links are already seen, the
  bloom removes the dominant shuffle.

Scale math (design point, documented for the 10^10 target): P=4096
partitions x 3.0 GB/4096 ≈ 0.7 MB... sized as bits = 14.4 *
(10^10/4096) ≈ 4.4 MB per partition bitset at 1% fpp, k=7 — each task
holds exactly one bitset in memory; update is an OR per partition.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _mm3_hash_long(v: np.ndarray, seed) -> np.ndarray:
    """Vectorized Murmur3_x86_32.hashLong — Spark's sketch hash (public
    org.apache.spark.unsafe.hash.Murmur3_x86_32 semantics: the long is
    mixed as two 32-bit lanes, low first). Written from the murmur3 spec
    so driver-set bits are readable by the JVM's BloomFilterImpl.
    ``seed`` may be a scalar or a per-element uint32 array."""
    C1, C2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)

    def rotl(x, r):
        return (x << np.uint32(r)) | (x >> np.uint32(32 - r))

    def mix_k1(k1):
        return rotl(k1 * C1, 15) * C2

    def mix_h1(h1, k1):
        return rotl(h1 ^ k1, 13) * np.uint32(5) + np.uint32(0xE6546B64)

    u = v.astype(np.uint64)
    low = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    high = (u >> np.uint64(32)).astype(np.uint32)
    h1 = np.broadcast_to(np.asarray(seed, dtype=np.uint32), low.shape)
    h1 = mix_h1(h1, mix_k1(low))
    h1 = mix_h1(h1, mix_k1(high))
    h1 = h1 ^ np.uint32(8)  # fmix(h1, 8): 8 input bytes
    h1 ^= h1 >> np.uint32(16)
    h1 = h1 * np.uint32(0x85EBCA6B)
    h1 ^= h1 >> np.uint32(13)
    h1 = h1 * np.uint32(0xC2B2AE35)
    h1 ^= h1 >> np.uint32(16)
    return h1


def _jvm_positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len, k) bit positions matching BloomFilterImpl.putLong/
    mightContainLong: h1 + i*h2 (i in 1..k) in int32, negative flipped
    with ~, then modulo the bit size."""
    h1 = _mm3_hash_long(hashes, 0)
    h2 = _mm3_hash_long(hashes, h1)
    i = np.arange(1, k + 1, dtype=np.uint32)
    combined = (h1[:, None] + i[None, :] * h2[:, None]).view(np.int32)
    combined = np.where(combined < 0, ~combined, combined)
    return combined.astype(np.int64) % np.int64(m_bits)


def _jvm_set_bits(words: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> None:
    """OR the key bits into a uint64 word array laid out like the JVM
    BitArray (bit j of word w = index w*64 + j)."""
    pos = _jvm_positions(hashes, m_bits, k).ravel()
    np.bitwise_or.at(
        words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
    )


def _jvm_test_bits(words: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Pure-Python twin of the JVM mightContainLong (agreement tests)."""
    pos = _jvm_positions(hashes, m_bits, k)
    bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return (bits != 0).all(axis=1)


def _jvm_bloom_serialize(words: np.ndarray, k: int) -> bytes:
    """Spark BloomFilterImpl V1 stream: version int, numHashFunctions int,
    BitArray (word count int + big-endian longs). Readable by
    BloomFilter.readFrom / the BloomFilterMightContain expression."""
    import struct

    return struct.pack(">iii", 1, k, len(words)) + words.astype(">u8").tobytes()


def _jvm_bloom_deserialize(blob: bytes) -> tuple[np.ndarray, int]:
    import struct

    version, k, n_words = struct.unpack(">iii", blob[:12])
    if version != 1:
        raise ValueError(f"unsupported bloom stream version {version}")
    words = np.frombuffer(blob[12:12 + 8 * n_words], dtype=">u8").astype(np.uint64)
    return words, k


def _bloom_params(expected_per_partition: int, fpp: float) -> tuple[int, int]:
    """(m_bits rounded to a multiple of 64, k) for the target fpp."""
    n = max(expected_per_partition, 1024)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(hashes), k) bit positions via double hashing on the u64 hash."""
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd -> full period
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bitset: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> None:
    pos = _positions(hashes, m_bits, k).ravel()
    np.bitwise_or.at(bitset, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(bitset: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    pos = _positions(hashes, m_bits, k)
    bits = (bitset[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


@dataclass
class SeenState:
    """Exact seen table + partitioned bloom, both plain DataFrames.

    ``num_partitions`` is the bloom/hash partition count (fixed for the
    crawl's lifetime — it is the key-space sharding, not the task count).
    """

    spark: SparkSession
    num_partitions: int = 8
    expected_total: int = 100_000
    fpp: float = 0.01
    use_bloom: bool = True
    # broadcast mode: the bitsets are AUTHORITATIVE ON THE DRIVER as numpy
    # shards; add() pulls only the round's url_hash delta (8 B/URL via
    # Arrow), sets bits locally, and novel() broadcasts only the shards
    # that changed since the last broadcast (a chain of per-round delta
    # broadcasts, compacted when stale entries exceed the live set). The
    # full bitset set never round-trips driver->cluster->driver per round
    # (VERDICT r1 finding #2: that was ~12 GB/round at the 10^10 design
    # point). Membership is a scalar pandas UDF over ONLY the hash column.
    # For blooms too large to broadcast at all, flip to False for the
    # cogroup-sharded path where each task sees only its shard.
    broadcast_bloom: bool = True
    # JVM serving mode (VERDICT r4 next #1): add() keeps the cheap
    # 8 B/URL delta pull, but the driver maintains ONE bitset in Spark's
    # own BloomFilterImpl V1 layout (vectorized numpy Murmur3), so
    # novel()'s membership test is a codegen'd JVM BloomFilterMightContain
    # expression — ZERO Python on the membership path (no Arrow batch
    # round-trips, no pandas UDF fixed cost per batch). The serialized
    # filter rides the stage's task closure as a binary literal —
    # deserialized per TASK, which is why the mode measured 35-44% SLOWER
    # than the delta-broadcast numpy path at 16M URLs (A/B'd both widths,
    # BENCH/ab_novel_r5.json + BENCH/BASELINE.md round-5 note): there is
    # no public seam to ship the literal as a real broadcast. Kept as an
    # opt-in serving mode (parity-tested; checkpoint round-trips), not
    # the default. Mutually exclusive with
    # broadcast_bloom; demotes to the cogroup-sharded mode on an oversized
    # delta by REBUILDING the sharded bitsets from the exact seen table
    # (bloom bits are not translatable between hash layouts).
    jvm_bloom: bool = False
    # auto-demotion guard (VERDICT r2 #2): broadcast-mode add() pulls the
    # round's url_hash delta through the driver (8 B/URL) — fine at
    # 10^5/round, a ~800 MB single-threaded bottleneck at 10^8. When a
    # delta exceeds this many rows the state migrates itself to the
    # cogroup-sharded mode (bit-setting happens on the executors, row
    # data never touches the driver) and stays there.
    broadcast_max_delta: int = 10_000_000
    # below this many (approx) seen rows novel() keeps the simple branchy
    # anti-join (AQE broadcasts it whole); above it the shuffle-slim
    # key-projection + broadcast-rescue shape wins (2x at 8M+ keys)
    slim_join_min_rows: int = 2_000_000
    # slim-shape lever (A/B'd in tools/ab_novel.py): localCheckpoint the
    # bloom-tested frame before its two consumers (survivor anti-join +
    # final probe) so the bloom UDF and the candidate lineage evaluate
    # ONCE instead of twice, at the price of materializing `tested`.
    fpp_checkpoint_tested: bool = False

    def __post_init__(self):
        self.m_bits, self.k = _bloom_params(
            self.expected_total // self.num_partitions, self.fpp
        )
        if self.jvm_bloom:
            self.broadcast_bloom = False  # modes are mutually exclusive
        # jvm mode: one UNSHARDED bitset sized for the whole crawl (the
        # sharded partition scheme would need one literal per shard in the
        # membership expression). Same applicability envelope as the
        # broadcast mode — the 10^10 design point stays cogroup-sharded.
        self.jvm_m_bits, self.jvm_k = _bloom_params(self.expected_total, self.fpp)
        self._jvm_words: np.ndarray | None = None
        self.seen: DataFrame = self.spark.createDataFrame(
            [], "url_hash long, surt string, url_canon string"
        )
        # approximate cumulative seen rows (sum of add() delta hints) —
        # picks the novel() join shape; order-of-magnitude is enough
        self.seen_rows_approx: int = 0
        # broadcast-mode state (driver-authoritative)
        self._shards: dict[int, np.ndarray] = {}
        self._dirty: set[int] = set()
        self._bc_chain: list = []
        self.last_broadcast_bytes = 0
        # sharded-mode state (cluster-authoritative DataFrame)
        empty = pd.DataFrame(
            {
                "pid": pd.Series(range(self.num_partitions), dtype="int32"),
                "bitset": [bytes(self.m_bits // 8)] * self.num_partitions,
            }
        )
        self._bloom_df: DataFrame = self.spark.createDataFrame(empty)

    # -- bloom as a DataFrame (checkpoint surface) ---------------------------
    @property
    def bloom(self) -> DataFrame:
        """The bloom as a (pid, bitset) DataFrame.

        Sharded mode: the live distributed table. Broadcast mode: built
        from the driver shards on demand (checkpoint/inspection only — the
        hot path never materializes it). JVM mode: one pid=-1 row holding
        the serialized BloomFilterImpl stream."""
        if self.jvm_bloom:
            words = (
                self._jvm_words
                if self._jvm_words is not None
                else np.zeros(self.jvm_m_bits // 64, dtype=np.uint64)
            )
            pdf = pd.DataFrame(
                {
                    "pid": pd.Series([-1], dtype="int32"),
                    "bitset": [_jvm_bloom_serialize(words, self.jvm_k)],
                }
            )
            return self.spark.createDataFrame(pdf)
        if not self.broadcast_bloom:
            return self._bloom_df
        zero = bytes(self.m_bits // 8)
        pdf = pd.DataFrame(
            {
                "pid": pd.Series(range(self.num_partitions), dtype="int32"),
                "bitset": [
                    self._shards[p].tobytes() if p in self._shards else zero
                    for p in range(self.num_partitions)
                ],
            }
        )
        return self.spark.createDataFrame(pdf)

    @bloom.setter
    def bloom(self, df: DataFrame) -> None:
        self._set_bloom(df, check_format=True)

    def _set_bloom(self, df: DataFrame, check_format: bool = True) -> None:
        """``check_format=False`` skips the sharded-mode jvm-layout probe
        (a filter+limit+count driver job) — safe ONLY when the caller knows
        the frame's provenance, i.e. the scheduler's in-loop lineage-
        truncation restore of bits this same crawl just wrote (ADVICE r6
        low: the probe cost one extra driver job per commit). True resumes
        and direct property assignment always probe."""
        if self.jvm_bloom:
            rows = df.filter(F.col("pid") == -1).collect()
            if rows:
                words, k = _jvm_bloom_deserialize(bytes(rows[0]["bitset"]))
                self._jvm_words = words.copy()
                self.jvm_k, self.jvm_m_bits = k, len(words) * 64
            else:
                # store written by a different bloom mode: bits are not
                # format-compatible — restore() rebuilds from the exact
                # seen table instead (bloom must never miss a seen key)
                self._jvm_words = None
        elif self.broadcast_bloom:
            self._seed_shards_from(df)
        else:
            # same guard as _seed_shards_from: a pid=-1 row is a jvm-mode
            # (BloomFilterImpl) checkpoint whose bits the numpy double-hash
            # shards can't read — silently adopting it would make novel()
            # crash (no real-pid rows) or, worse after an add(), re-schedule
            # previously-seen URLs (ADVICE r5 medium).
            if check_format and df.filter(F.col("pid") < 0).limit(1).count() > 0:
                raise ValueError(
                    "bloom checkpoint was written in jvm serving mode "
                    "(BloomFilterImpl layout); its bits are not readable "
                    "by the numpy double-hash modes — resume with "
                    "jvm_bloom=True (or use_bloom=False)"
                )
            self._bloom_df = df

    def _seed_shards_from(self, df: DataFrame) -> None:
        """Load driver shards from a (pid, bitset) DataFrame (restore path —
        one full collect at resume, never per round)."""
        self._shards = {}
        for r in df.collect():
            if int(r["pid"]) < 0:
                raise ValueError(
                    "bloom checkpoint was written in jvm serving mode "
                    "(BloomFilterImpl layout); its bits are not readable "
                    "by the numpy double-hash modes — resume with "
                    "jvm_bloom=True (or use_bloom=False)"
                )
            bits = np.frombuffer(bytes(r["bitset"]), dtype=np.uint8).copy()
            if bits.any():
                self._shards[int(r["pid"])] = bits
        for bc in self._bc_chain:
            bc.unpersist()
        self._bc_chain = []
        self._dirty = set(self._shards)  # rebroadcast live shards lazily

    # -- helpers ------------------------------------------------------------
    @property
    def is_sharded(self) -> bool:
        """True when the bloom lives cluster-side as a (pid, bitset) table
        (configured, or arrived at by auto-demotion from either driver
        mode) — the caller must then checkpoint ``bloom`` per round."""
        return self.use_bloom and not self.broadcast_bloom and not self.jvm_bloom

    def _pid(self, col):
        return F.pmod(col, F.lit(self.num_partitions)).cast("int")

    def _switch_to_sharded(self) -> None:
        """Migrate driver-authoritative shards into the cluster-side
        (pid, bitset) table and demote to cogroup-sharded mode. One-way:
        a crawl whose rounds outgrow the broadcast path stays sharded."""
        self._bloom_df = self.bloom  # getter builds the DF from driver shards
        self.broadcast_bloom = False
        for bc in self._bc_chain:
            bc.unpersist()
        self._bc_chain = []
        self._shards = {}
        self._dirty = set()

    def _switch_jvm_to_sharded(self) -> None:
        """Demote jvm mode to the cogroup-sharded mode. Bloom bits cannot
        be translated between hash layouts (Murmur3/BloomFilterImpl vs the
        sharded double-hash scheme), so the sharded bitsets are REBUILT
        from the exact seen table — one distributed pass, once per crawl
        at most (demotion is one-way), and false negatives are impossible
        because ``self.seen`` is the source of truth."""
        self.jvm_bloom = False
        self._jvm_words = None
        m_bits, k = self.m_bits, self.k

        def or_partition(key, bloom_pdf, new_pdf):
            if len(bloom_pdf):
                bits = np.frombuffer(bloom_pdf["bitset"].iloc[0], dtype=np.uint8).copy()
            else:
                bits = np.zeros(m_bits // 8, dtype=np.uint8)
            if len(new_pdf):
                _set_bits(bits, new_pdf["url_hash"].to_numpy(), m_bits, k)
            return pd.DataFrame({"pid": [key[0]], "bitset": [bits.tobytes()]})

        all_hashed = self.seen.select(
            self._pid(F.col("url_hash")).alias("pid"), "url_hash"
        )
        self._bloom_df = (
            self._bloom_df.groupBy("pid")
            .cogroup(all_hashed.groupBy("pid"))
            .applyInPandas(or_partition, "pid int, bitset binary")
            .localCheckpoint(eager=True)
        )

    # -- api ----------------------------------------------------------------
    def add(self, urls: DataFrame, n_rows: int | None = None) -> None:
        """Insert (url_hash, surt, url_canon) rows; caller guarantees they
        are not already present (the round loop only adds survivors of
        ``novel()``) and that any pending ``novel()`` result was
        materialized first (the round loop localCheckpoints between the
        two — see novel()).

        ``n_rows``: the delta's row count when the caller already knows it
        (the round loop does — no extra action). In broadcast mode a delta
        above ``broadcast_max_delta`` triggers self-demotion to sharded
        mode BEFORE any row data is pulled to the driver; with no hint a
        broadcast-mode add counts the delta first (one cheap job) for the
        same guarantee."""
        rows = urls.select("url_hash", "surt", "url_canon")
        self.seen = self.seen.unionByName(rows)
        if n_rows is not None:
            self.seen_rows_approx += n_rows
        if not self.use_bloom:
            return
        m_bits, k = self.m_bits, self.k
        if self.jvm_bloom:
            if n_rows is None:
                n_rows = rows.count()
                self.seen_rows_approx += n_rows
            if n_rows > self.broadcast_max_delta:
                # oversized delta: rebuild sharded bitsets from the exact
                # seen table (which already includes this delta — union
                # above) and stay sharded for the rest of the crawl
                self._switch_jvm_to_sharded()
                return
            hv = rows.select("url_hash").toPandas()["url_hash"].to_numpy()
            if not len(hv):
                return
            if self._jvm_words is None:
                self._jvm_words = np.zeros(self.jvm_m_bits // 64, dtype=np.uint64)
            _jvm_set_bits(self._jvm_words, hv, self.jvm_m_bits, self.jvm_k)
            return
        if self.broadcast_bloom:
            if n_rows is None:
                n_rows = rows.count()
                self.seen_rows_approx += n_rows
            if n_rows > self.broadcast_max_delta:
                self._switch_to_sharded()  # falls through to cogroup path
        if self.broadcast_bloom:
            # pull ONLY the hash column (8 B/URL, Arrow) — the round delta
            hv = rows.select("url_hash").toPandas()["url_hash"].to_numpy()
            if not len(hv):
                return
            pids = (hv % self.num_partitions + self.num_partitions) % self.num_partitions
            for p in np.unique(pids):
                shard = self._shards.get(int(p))
                if shard is None:
                    shard = np.zeros(m_bits // 8, dtype=np.uint8)
                    self._shards[int(p)] = shard
                _set_bits(shard, hv[pids == p], m_bits, k)
                self._dirty.add(int(p))
            return

        def or_partition(key, bloom_pdf, new_pdf):
            if len(bloom_pdf):
                bits = np.frombuffer(bloom_pdf["bitset"].iloc[0], dtype=np.uint8).copy()
            else:  # partition had no bitset row (cannot happen after init)
                bits = np.zeros(m_bits // 8, dtype=np.uint8)
            if len(new_pdf):
                _set_bits(bits, new_pdf["url_hash"].to_numpy(), m_bits, k)
            return pd.DataFrame({"pid": [key[0]], "bitset": [bits.tobytes()]})

        new_hashed = rows.select(
            self._pid(F.col("url_hash")).alias("pid"), "url_hash"
        )
        self._bloom_df = (
            self._bloom_df.groupBy("pid")
            .cogroup(new_hashed.groupBy("pid"))
            .applyInPandas(or_partition, "pid int, bitset binary")
        )

    def novel(self, cands: DataFrame) -> DataFrame:
        """Rows of ``cands`` (must carry url_hash, surt) NOT in the seen set.

        Bloom miss -> definitely new (no join). Bloom hit -> exact
        anti-join resolves false positives. Without bloom: plain anti-join.

        Snapshot contract: the result captures the seen set AS OF THIS
        CALL (broadcast chain is snapshotted here; the exact table is the
        lazily-captured ``self.seen`` plan). Materialize the result before
        the next ``add()`` — the scheduler's round loop localCheckpoints
        eagerly between the two, which pins the snapshot.
        """
        if not self.use_bloom:
            return cands.join(self.seen.select("surt"), "surt", "left_anti")
        if self.jvm_bloom:
            return self._novel_jvm(cands)
        if self.broadcast_bloom:
            return self._novel_broadcast(cands)

        m_bits, k = self.m_bits, self.k

        def test_partition(key, bloom_pdf, cand_pdf):
            if not len(cand_pdf):
                return cand_pdf.assign(maybe_seen=pd.Series([], dtype=bool))
            bits = np.frombuffer(bloom_pdf["bitset"].iloc[0], dtype=np.uint8)
            hit = _test_bits(bits, cand_pdf["url_hash"].to_numpy(), m_bits, k)
            return cand_pdf.assign(maybe_seen=hit)

        cands_p = cands.withColumn("pid", self._pid(F.col("url_hash")))
        schema = ", ".join(f"{n} {t}" for n, t in cands_p.dtypes) + ", maybe_seen boolean"
        tested = (
            self._bloom_df.groupBy("pid")
            .cogroup(cands_p.groupBy("pid"))
            .applyInPandas(test_partition, schema)
        )
        return self._fpp_filter(tested).drop("maybe_seen", "pid")

    def _fpp_filter(self, tested: DataFrame) -> DataFrame:
        """Single-pass novel filter with shuffle-slim false-positive rescue.

        ``tested`` = candidates + a ``maybe_seen`` bloom verdict. Novel =
        bloom-miss rows, PLUS bloom-hit rows that are NOT actually in the
        seen table (false positives). Two structural choices for scale:

        1. The exact anti-join that finds the false positives runs on a
           slim (url_hash, surt) projection — shuffling full candidate
           rows (canonical URL + host strings) through it would multiply
           the exchange bytes for no information. Survivor count is
           bounded by fpp x |candidates| (the novel rows that
           false-positived), so the rescue set is always broadcastable at
           a sane fpp.
        2. The output is ONE scan of ``tested`` with a broadcast probe
           (bloom-miss OR fpp-survivor), not a union of two filter
           branches: Catalyst evaluates union branches independently, so
           the branchy shape re-runs the candidate lineage (parse +
           bloom UDF) once per branch; this shape runs the full-width
           lineage once.
        """
        if self.seen_rows_approx < self.slim_join_min_rows:
            # small-state shape: AQE broadcasts the whole anti-join at this
            # size, and the slim shape's extra stages (survivor distinct +
            # broadcast build + probe join) are pure fixed latency here
            # (~1 s/round measured at toy rounds)
            definitely_new = tested.filter(~F.col("maybe_seen"))
            maybe = tested.filter(F.col("maybe_seen"))
            resolved = maybe.join(self.seen.select("surt"), "surt", "left_anti")
            return definitely_new.unionByName(resolved)
        keys = ["url_hash", "surt"]
        if self.fpp_checkpoint_tested:
            tested = tested.localCheckpoint(eager=True)
        survivors = (
            tested.filter(F.col("maybe_seen"))
            .select(*keys)
            .join(self.seen.select(*keys), keys, "left_anti")
            .distinct()  # candidate dupes must not multiply the left join
            .withColumn("_fpp", F.lit(True))
        )
        return (
            tested.join(F.broadcast(survivors), keys, "left")
            .filter(~F.col("maybe_seen") | F.col("_fpp").isNotNull())
            .select(tested.columns)  # join-on-list reorders; restore
        )

    def _refresh_chain(self) -> None:
        """Broadcast only the shards dirtied since the last broadcast; the
        chain resolves latest-wins on the executors. Compact when stale
        entries outnumber live shards 2:1 (bounds executor memory at ~3x
        the live bitset set, amortized O(1) broadcasts per round)."""
        if self._dirty:
            delta = {p: self._shards[p].tobytes() for p in sorted(self._dirty)}
            self._bc_chain.append(self.spark.sparkContext.broadcast(delta))
            self.last_broadcast_bytes = sum(len(b) for b in delta.values())
            self._dirty = set()
        entries = sum(len(bc.value) for bc in self._bc_chain)
        live = len({p for bc in self._bc_chain for p in bc.value})
        if len(self._bc_chain) > 1 and entries > 2 * max(live, 1):
            merged: dict[int, bytes] = {}
            for bc in self._bc_chain:
                merged.update(bc.value)
            for bc in self._bc_chain:
                bc.unpersist()
            self._bc_chain = [self.spark.sparkContext.broadcast(merged)]

    def _novel_broadcast(self, cands: DataFrame) -> DataFrame:
        """Broadcast-bloom membership: per-round DELTA broadcasts (changed
        shards only); the UDF touches only the hash column."""
        import pandas as pd  # noqa: F811 (executor-side import)

        self._refresh_chain()
        chain = tuple(self._bc_chain)  # snapshot: later add()s don't leak in
        m_bits, k, P = self.m_bits, self.k, self.num_partitions

        @F.pandas_udf("boolean")
        def bloom_maybe(h: pd.Series) -> pd.Series:
            snapshot: dict[int, bytes] = {}
            for bc in chain:
                snapshot.update(bc.value)
            hv = h.to_numpy()
            pids = (hv % P + P) % P  # pmod
            out = np.zeros(len(hv), dtype=bool)
            for p in np.unique(pids):
                blob = snapshot.get(int(p))
                if blob is None:  # shard never written -> definitely new
                    continue
                sel = pids == p
                out[sel] = _test_bits(
                    np.frombuffer(blob, dtype=np.uint8), hv[sel], m_bits, k
                )
            return pd.Series(out)

        tested = cands.withColumn("maybe_seen", bloom_maybe(F.col("url_hash")))
        return self._fpp_filter(tested).drop("maybe_seen")

    def _might_contain_col(self, blob: bytes, col_name: str):
        """A Column evaluating Spark's BloomFilterMightContain(lit(blob),
        col) — the JVM expression behind SQL runtime row-group filtering
        (codegen'd, whole-stage). Not in the SQL function registry, so the
        expression tree is built directly; the serialized filter literal
        ships with the stage's task binary (one copy per executor)."""
        from pyspark.sql import Column

        jvm = self.spark.sparkContext._jvm
        ce = jvm.org.apache.spark.sql.catalyst.expressions
        lit = ce.Literal.create(
            blob, jvm.org.apache.spark.sql.types.DataTypes.BinaryType
        )
        attr = jvm.org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(
            col_name
        )
        expr = ce.BloomFilterMightContain(lit, attr)
        return Column(jvm.org.apache.spark.sql.classic.ExpressionUtils.column(expr))

    def _novel_jvm(self, cands: DataFrame) -> DataFrame:
        """JVM-bloom membership: the whole novel path stays inside
        whole-stage codegen — no Arrow transfer, no Python worker, no
        per-batch fixed cost. The literal snapshot also pins the seen-set
        AS OF THIS CALL for free (bytes are copied at expression build)."""
        if self._jvm_words is None:  # nothing inserted yet
            tested = cands.withColumn("maybe_seen", F.lit(False))
        else:
            blob = _jvm_bloom_serialize(self._jvm_words, self.jvm_k)
            self.last_broadcast_bytes = len(blob)
            tested = cands.withColumn(
                "maybe_seen", self._might_contain_col(blob, "url_hash")
            )
        return self._fpp_filter(tested).drop("maybe_seen")

    def checkpoint_to(self, write_fn) -> None:
        """Materialize state via the caller-provided writer (checkpoint.py)."""
        write_fn("seen", self.seen)
        if self.use_bloom:
            write_fn("bloom", self.bloom)

    def restore(
        self,
        seen: DataFrame,
        bloom: DataFrame | None,
        assume_large: bool = True,
        check_format: bool = True,
    ) -> None:
        """``assume_large``: on a true resume the state size is unknown
        without an action, so assume large and let novel() pick the
        scale-safe slim-join shape (semantics identical). The scheduler's
        IN-LOOP lineage-truncation restore passes False — it already
        tracks the exact approx via add() hints, and inflating it there
        would permanently switch toy-sized crawls onto the slim join's
        ~1 s/round fixed latency (ADVICE r3 #2)."""
        self.seen = seen
        if assume_large:
            self.seen_rows_approx = max(self.seen_rows_approx, self.slim_join_min_rows)
        if bloom is not None:
            # broadcast mode: seeds driver shards (setter path)
            self._set_bloom(bloom, check_format=check_format)
            if self.jvm_bloom and self._jvm_words is None:
                # checkpoint came from a different bloom mode: rebuild the
                # JVM-layout bitset from the exact seen table (one 8 B/row
                # hash pull, same order as the broadcast-mode full-shard
                # restore; false negatives impossible — seen is the truth)
                hv = self.seen.select("url_hash").toPandas()["url_hash"].to_numpy()
                self._jvm_words = np.zeros(self.jvm_m_bits // 64, dtype=np.uint64)
                if len(hv):
                    _jvm_set_bits(self._jvm_words, hv, self.jvm_m_bits, self.jvm_k)
