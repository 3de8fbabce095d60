"""URL-seen filters: sharded bloom + cuckoo over canonical-URL hashes.

North rule: "bloom/cuckoo URL-seen" at 10^10-URL-frontier scale. A
10^10-key seen-set cannot be a broadcast (12.5 GB at 10 bits/key), so
filters are SHARDED blobs co-partitioned with the url_hash stream:
shard = pmod(url_hash, n_shards); each shard row holds one numpy bit
array (bloom) or bucket table (cuckoo), stored in the ``seen`` table
(binary column — FIXTURES F5 schema).

Exactness policy (SURVEY §7.4): a bloom false positive must never drop
a never-seen url (the oracle trace would diverge), so the bloom is a
PREFILTER ONLY — "definitely new" urls (bloom miss — no false
negatives) skip the expensive exact anti-join against the frontier;
only the maybe-seen remainder (true dupes + FP rate) pays it. Crawl
link batches are dup-heavy, so the prefilter cuts the anti-join input
by the dup fraction while guaranteeing trace equality.

pomp analog: none built-in — dedup is user middleware returning None
(pomp/core/base.py BaseMiddleware.process_request); the filters are an
[A] addition. All vector math is numpy inside Arrow-batched pandas
UDFs; nothing here is per-row Python.

Hash design: the stream key is xxhash64(url) computed JVM-side
(F.xxhash64; murmur3_32 = F.hash is also carried in the frontier per
the north rule). Inside a filter, k bloom probes derive from the one
64-bit key by splitting + Kirsch-Mitzenmacher double hashing
(h_i = h_lo + i*h_hi mod nbits) — no re-hashing of strings in Python.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

# ------------------------------------------------------------------ bloom

def bloom_params(capacity: int, fp_rate: float) -> tuple[int, int]:
    """(nbits, nhashes) sized for capacity keys at fp_rate."""
    nbits = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
    nbits = (nbits + 7) & ~7  # byte-align
    k = max(1, round(nbits / capacity * math.log(2))) if capacity else 1
    return nbits, k


def _probes(hashes: np.ndarray, nbits: int, k: int) -> np.ndarray:
    """(n, k) probe positions via double hashing of the 64-bit key."""
    h = hashes.astype(np.uint64)
    lo = h & np.uint64(0xFFFFFFFF)
    hi = (h >> np.uint64(32)) | np.uint64(1)  # odd-ish, never 0
    i = np.arange(k, dtype=np.uint64)
    return ((lo[:, None] + i[None, :] * hi[:, None]) % np.uint64(nbits)).astype(np.int64)


class Bloom:
    """One shard's bloom filter over int64 keys (numpy bit array)."""

    def __init__(self, nbits: int, nhashes: int, bits: np.ndarray | None = None):
        self.nbits = nbits
        self.nhashes = nhashes
        self.bits = bits if bits is not None else np.zeros(nbits // 8, dtype=np.uint8)

    @classmethod
    def sized(cls, capacity: int, fp_rate: float = 0.01) -> "Bloom":
        return cls(*bloom_params(capacity, fp_rate))

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = _probes(np.asarray(keys, dtype=np.int64), self.nbits, self.nhashes)
        flat = pos.reshape(-1)
        np.bitwise_or.at(self.bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = _probes(np.asarray(keys, dtype=np.int64), self.nbits, self.nhashes)
        bitset = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return bitset.all(axis=1).astype(bool)

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, nbits: int, nhashes: int, blob: bytes) -> "Bloom":
        return cls(nbits, nhashes, np.frombuffer(blob, dtype=np.uint8).copy())

    def merge(self, other: "Bloom") -> "Bloom":
        assert (self.nbits, self.nhashes) == (other.nbits, other.nhashes)
        return Bloom(self.nbits, self.nhashes, self.bits | other.bits)


# ------------------------------------------------------------------ cuckoo

class Cuckoo:
    """Cuckoo filter shard: 4-slot buckets, 16-bit fingerprints —
    compact exact-ish membership WITH DELETE (blooms can't delete;
    the frontier needs deletion when a url is re-queued after an
    error retry). numpy bucket table, vectorized lookup; insert is
    amortized-python over collisions only.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        self.n_buckets = n_buckets  # power of two
        self.table = table if table is not None else np.zeros(
            (n_buckets, self.SLOTS), dtype=np.uint16
        )

    @classmethod
    def sized(cls, capacity: int) -> "Cuckoo":
        n = 1
        while n * cls.SLOTS * 0.95 < capacity:
            n <<= 1
        return cls(n)

    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = ((keys.astype(np.uint64) >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 = empty slot sentinel
        return fp

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (keys.astype(np.uint64) % np.uint64(self.n_buckets)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo: i2 = i1 xor hash(fp)
        h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(0xFFFFFFFF)
        return (i1.astype(np.uint64) ^ h) % np.uint64(self.n_buckets)

    def insert(self, keys: np.ndarray) -> int:
        """Insert; returns number that failed (table full).

        Vectorized no-collision fast path (r3 verdict: the old code
        walked EVERY key in Python, not just collisions): one
        ``_bulk_place`` pass over bucket1 (rank-within-bucket scatter —
        every key whose bucket has a free slot lands in this pass),
        one more over bucket2 for the overflow, then the per-key kick
        loop only for keys whose BOTH buckets are full — a small
        minority at design load (<=95%), so the Python loop is
        amortized over genuine collisions only."""
        keys = np.asarray(keys, dtype=np.int64)
        fps = self._fp(keys)
        i1s = self._i1(keys)
        i2s = self._i2(i1s, fps).astype(np.int64)
        pending = np.arange(len(keys))
        for buckets in (i1s, i2s):
            if len(pending):
                pending = self._bulk_place(buckets, fps, pending)
        failed = 0
        rng_state = 0x9E3779B9
        for j in pending:
            # kick loop (both candidate buckets were full)
            b, f = int(i1s[j]), int(fps[j])
            for _ in range(self.MAX_KICKS):
                rng_state = (rng_state * 1103515245 + 12345) & 0x7FFFFFFF
                slot = rng_state % self.SLOTS
                f, self.table[b, slot] = int(self.table[b, slot]), f
                b = int(self._i2(np.array([b]), np.array([np.uint16(f)]))[0])
                row = self.table[b]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    self.table[b, empty[0]] = f
                    f = 0
                    break
            if f != 0:
                failed += 1
        return failed

    def _bulk_place(self, buckets: np.ndarray, fps: np.ndarray,
                    idx: np.ndarray) -> np.ndarray:
        """One vectorized placement pass: scatter ``fps[idx]`` into the
        empty slots of ``buckets[idx]``, at most as many per bucket as
        it has empty slots. Same-bucket contenders are ranked (stable
        sort by bucket); rank r takes the (r+1)-th empty slot, so no
        two keys race for one slot and deletion holes are respected
        (slots need not be prefix-packed). Returns the original indices
        NOT placed."""
        b = buckets[idx]
        order = np.argsort(b, kind="stable")
        sb, si = b[order], idx[order]
        newgrp = np.r_[True, sb[1:] != sb[:-1]] if len(sb) else np.zeros(0, bool)
        grp_start = np.flatnonzero(newgrp)
        ranks = np.arange(len(sb)) - np.repeat(
            grp_start, np.diff(np.r_[grp_start, len(sb)])
        )
        empty = self.table[sb] == 0                    # (n, SLOTS)
        # unrolled per-column prefix sum: np.cumsum(axis=1) walks the
        # short axis per row and costs ~60x these three strided adds
        # (measured 904 ms vs 15 ms at n=1e6)
        csum = empty.astype(np.int8)
        for j in range(1, self.SLOTS):
            csum[:, j] += csum[:, j - 1]
        ok = ranks < csum[:, -1]
        slot = np.argmax(empty & (csum == (ranks + 1)[:, None]), axis=1)
        self.table[sb[ok], slot[ok]] = fps[si[ok]]
        return si[~ok]

    def insert_fp(self, b: int, fp: int) -> bool:
        """Insert a known (bucket, fingerprint) slot — used when merging
        two cuckoo shards (keys are not recoverable from a filter, but
        (bucket, fp) fully determines both candidate buckets)."""
        i2 = int(self._i2(np.array([b]), np.array([np.uint16(fp)]))[0])
        for cand in (int(b), i2):
            row = self.table[cand]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                self.table[cand, empty[0]] = fp
                return True
        rng_state = 0x9E3779B9
        cur_b, f = int(b), int(fp)
        for _ in range(self.MAX_KICKS):
            rng_state = (rng_state * 1103515245 + 12345) & 0x7FFFFFFF
            slot = rng_state % self.SLOTS
            f, self.table[cur_b, slot] = int(self.table[cur_b, slot]), f
            cur_b = int(self._i2(np.array([cur_b]), np.array([np.uint16(f)]))[0])
            row = self.table[cur_b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                self.table[cur_b, empty[0]] = f
                return True
        return False

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._i2(i1, fp).astype(np.int64)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Best-effort delete; returns mask of keys actually removed."""
        keys = np.asarray(keys, dtype=np.int64)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._i2(i1, fp).astype(np.int64)
        removed = np.zeros(len(keys), dtype=bool)
        for j in range(len(keys)):
            for b in (int(i1[j]), int(i2[j])):
                row = self.table[b]
                hit = np.flatnonzero(row == fp[j])
                if len(hit):
                    self.table[b, hit[0]] = 0
                    removed[j] = True
                    break
        return removed

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, n_buckets: int, blob: bytes) -> "Cuckoo":
        t = np.frombuffer(blob, dtype=np.uint16).copy().reshape(n_buckets, cls.SLOTS)
        return cls(n_buckets, t)


# ------------------------------------------------------------ Spark surface


def _sparse_dtype(nbits: int):
    """Position dtype for 'bloomsp' sparse deltas. bloom_params gives
    nbits >= 2^32 once capacity_per_shard exceeds ~4.5e8 (the 10^10-key
    regime this path targets); uint32 positions would silently wrap mod
    2^32 there, producing bloom FALSE NEGATIVES — which breaks the
    module's core safety invariant ('definitely new' skips the exact
    anti-join). Positions < 2^32 stay uint32 (half the bytes)."""
    return np.uint32 if nbits <= (1 << 32) else np.uint64


def _blob_contains(kind: str, nbits: int, nhashes: int, blob: bytes,
                   keys: np.ndarray) -> np.ndarray:
    if kind == "bloom":
        return Bloom.from_bytes(nbits, nhashes, blob).contains(keys)
    if kind == "bloomsp":
        # sparse delta: blob = sorted set-bit positions (dtype derived
        # from nbits — see _sparse_dtype). Probe directly against the
        # position set (no bitmap materialized).
        sp = np.frombuffer(blob, dtype=_sparse_dtype(nbits)).astype(np.int64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = _probes(np.asarray(keys, dtype=np.int64), nbits, nhashes)
        return np.isin(pos, sp).all(axis=1)
    return Cuckoo.from_bytes(nbits // (Cuckoo.SLOTS * 16), blob).contains(keys)


def _or_blob_into(bits: np.ndarray, kind: str, blob: bytes) -> None:
    """OR a dense ('bloom') or sparse ('bloomsp') delta into a dense
    bit array in place. nbits is recovered from the dense target
    (len(bits)*8) to pick the sparse-position dtype."""
    if kind == "bloom":
        bits |= np.frombuffer(blob, dtype=np.uint8)
    else:
        pos = np.frombuffer(blob, dtype=_sparse_dtype(len(bits) * 8)).astype(np.int64)
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


class SeenFilter:
    """Sharded seen-set over a Catalog ``seen`` table — NOTHING here
    ever collects blobs to the driver on the write path.

    Layout: the ``seen`` table holds per-shard DELTA blobs, one per
    ``add()`` call per touched shard, all sized identically
    (bloom_params(capacity_per_shard, fp_rate)) so membership is the
    OR over a shard's deltas and compaction is a bitwise-OR reduce.

    - ``add()``: groupBy(shard).applyInPandas folds the NEW keys into
      fresh delta blobs and APPENDS them — the existing table is never
      read, nothing visits the driver (round-1 advice: the old path
      collected every blob per round -> driver OOM at 10^10 keys).
    - membership: two exact-equivalent paths behind ``maybe_seen_col``:
      a broadcast path while the table is small (blobs OR-merged per
      shard on the driver once, then probed in a pandas UDF), and a
      SHARD-JOIN path (cogroup candidates x shard rows, probe inside
      applyInPandas) once the table outgrows broadcast — at 10^10 keys
      (~12.5 GB of bloom bits over n_shards) only the join path runs,
      and each task sees one shard's blobs only.
    - ``compact()``: per-shard OR-reduce (applyInPandas) -> overwrite;
      call every K rounds (the engine piggybacks it on frontier
      compaction) to bound delta counts.

    False positives are harmless by design (SURVEY §7.4): the caller
    treats ``maybe_seen`` rows with an exact anti-join; bloom misses
    ("definitely new") bypass it. Deletion (cuckoo) exists at the
    data-structure level for user middleware parity, but the ENGINE
    never deletes: retry re-queueing keeps a url's discovered-identity,
    so the merge must keep suppressing re-discoveries of it.
    """

    def __init__(self, cat, n_shards: int = 16, capacity_per_shard: int = 1_000_000,
                 fp_rate: float = 0.01, kind: str = "bloom",
                 broadcast_bytes_max: int = 128 << 20):
        from pompspark import schemas

        self.cat = cat
        self.n_shards = n_shards
        self.capacity = capacity_per_shard
        self.fp_rate = fp_rate
        self.kind = kind
        self.broadcast_bytes_max = broadcast_bytes_max
        # broadcast-path incremental cache: driver-side OR-merged blobs
        # and the snapshot dirs they reflect. Each round only the NEW
        # delta dirs are read and OR'd in — without this the broadcast
        # path re-collects EVERY blob every round (O(rounds x table)
        # driver IO; measured as the dominant approx-merge cost).
        self._merged: dict[int, list] | None = None
        self._cache_dirs: set[str] = set()
        self._cache_version: int = -1
        # non-dir catalogs (no _read_snapshot dirs list): bound delta
        # accrual by counting appends since the last compact instead
        self._appends_since_compact: int = 0
        self._dir_layout: bool = getattr(cat, "SUPPORTS_DIR_LAYOUT", True)
        self._bcast = None
        cat.create("seen", schemas.SEEN)

    # -------------------------------------------------------------- update
    def add(self, df, hash_col: str = "url_hash") -> None:
        """Append per-shard delta blobs built from the new keys only.
        One applyInPandas pass; the write is the materialization."""
        from pyspark.sql import functions as F

        from pompspark import schemas

        nbits, k = bloom_params(self.capacity, self.fp_rate)
        capacity, kind = self.capacity, self.kind

        keyed = df.select(
            F.col(hash_col).alias("key"),
            F.pmod(F.col(hash_col), F.lit(self.n_shards)).cast("int").alias("shard"),
        )

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            keys = pdf["key"].to_numpy(dtype=np.int64)
            if kind == "bloom":
                # SPARSE delta when cheaper: a round's batch sets at
                # most |batch|*k bits of the capacity-sized array —
                # writing the full bitmap per round is O(capacity) IO
                # regardless of batch size (12.5 GB/round at 10^10
                # keys). Store sorted uint32 set-bit positions instead
                # when that is smaller; membership and compaction
                # understand both ('bloomsp' in _blob_contains /
                # _or_blob_into).
                pos = np.unique(_probes(keys, nbits, k).reshape(-1))
                dt = _sparse_dtype(nbits)
                if len(pos) * dt().itemsize < nbits // 8:
                    return pd.DataFrame({
                        "shard": [shard], "kind": ["bloomsp"],
                        "nbits": [nbits], "nhashes": [k],
                        "filter": [pos.astype(dt).tobytes()],
                    })
                f = Bloom(nbits, k)
                f.add(keys)
                payload, nb, nh = f.to_bytes(), nbits, k
            else:
                c = Cuckoo.sized(capacity)
                c.insert(keys)
                payload, nb, nh = c.to_bytes(), c.n_buckets * Cuckoo.SLOTS * 16, 2
            return pd.DataFrame({
                "shard": [shard], "kind": [kind], "nbits": [nb],
                "nhashes": [nh], "filter": [payload],
            })

        delta = keyed.groupBy("shard").applyInPandas(fold, schema=schemas.SEEN)
        self.cat.append("seen", delta)
        self._appends_since_compact += 1

    def compact(self) -> None:
        """Per-shard merge of delta blobs (bitwise OR for uniform
        blooms; slot re-insertion for cuckoos) -> overwrite. Executor-
        side; the driver only commits the manifest."""
        from pompspark import schemas

        def merge(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            kinds = pdf["kind"].tolist()
            if all(kd in ("bloom", "bloomsp") for kd in kinds):
                nb = int(pdf["nbits"].iloc[0])
                nh = int(pdf["nhashes"].iloc[0])
                bits = np.zeros(nb // 8, dtype=np.uint8)
                for kd, blob in zip(kinds, pdf["filter"]):
                    _or_blob_into(bits, kd, bytes(blob))
                return pd.DataFrame({
                    "shard": [shard], "kind": ["bloom"], "nbits": [nb],
                    "nhashes": [nh], "filter": [bits.tobytes()],
                })
            # cuckoo: re-insert every occupied (bucket, fp) slot into
            # one table (alt bucket is derivable from (bucket, fp)).
            nb = int(pdf["nbits"].iloc[0])
            acc = Cuckoo.from_bytes(nb // (Cuckoo.SLOTS * 16), bytes(pdf["filter"].iloc[0]))
            for blob in pdf["filter"].iloc[1:]:
                src = Cuckoo.from_bytes(nb // (Cuckoo.SLOTS * 16), bytes(blob))
                bs, ss = np.nonzero(src.table)
                for b_, s_ in zip(bs, ss):
                    acc.insert_fp(int(b_), int(src.table[b_, s_]))
            return pd.DataFrame({
                "shard": [shard], "kind": ["cuckoo"], "nbits": [nb],
                "nhashes": [2], "filter": [acc.to_bytes()],
            })

        merged = self.cat.read("seen").groupBy("shard").applyInPandas(
            merge, schema=schemas.SEEN
        )
        self.cat.overwrite("seen", merged)
        # compaction rewrote the dirs the cache reflects; next use
        # re-reads the single merged dir (cheap) instead of guessing.
        self._merged, self._cache_dirs, self._cache_version = None, set(), -1
        self._appends_since_compact = 0

    def maybe_compact(self, max_dirs: int = 8) -> bool:
        """Compact when delta dirs accrete past ``max_dirs`` —
        decoupled from frontier compaction so a long crawl with
        compact_every=0 still bounds per-shard blob counts (the
        membership cost is O(deltas per shard))."""
        if self._dir_layout:
            v = self.cat.current_version("seen")
            n_deltas = len(self.cat._read_snapshot("seen", v)["dirs"])
        else:
            n_deltas = self._appends_since_compact
        if n_deltas <= max_dirs:
            return False
        self.compact()
        return True

    # ------------------------------------------------------------ prefilter
    def table_bytes(self) -> int:
        """On-disk size of the seen table (driver fs metadata only)."""
        import glob as _glob
        import os as _os

        if not self._dir_layout:
            # no posix dirs to stat: conservative DENSE upper bound
            # (n_shards x per-blob bytes x un-compacted deltas). Only
            # steers the broadcast-vs-join choice; overestimating
            # flips to the join path early, which is always correct.
            if self.kind == "bloom":
                nbits, _k = bloom_params(self.capacity, self.fp_rate)
            else:
                c = Cuckoo.sized(self.capacity)
                nbits = c.n_buckets * Cuckoo.SLOTS * 16
            return self.n_shards * (nbits // 8) * (
                self._appends_since_compact + 1)
        v = self.cat.current_version("seen")
        snap = self.cat._read_snapshot("seen", v)
        total = 0
        for d in snap["dirs"]:
            base = _os.path.join(self.cat._tdir("seen"), d)
            for f in _glob.glob(_os.path.join(base, "**", "*.parquet"), recursive=True):
                total += _os.path.getsize(f)
        return total

    def maybe_seen_col(self, df, hash_col: str = "url_hash"):
        """Adds ``maybe_seen`` boolean. False = DEFINITELY new (bloom
        has no false negatives) -> the caller may skip the exact
        anti-join for those rows. Auto-selects broadcast vs shard-join
        by on-disk table size."""
        from pyspark.sql import functions as F

        # the broadcast payload is the MERGED dense bitmap (n_shards x
        # nbits/8) — sparse deltas make on-disk size an underestimate,
        # so gate on whichever is larger.
        nbits, _k = bloom_params(self.capacity, self.fp_rate)
        merged_bytes = self.n_shards * (nbits // 8) if self.kind == "bloom" else 0
        if max(self.table_bytes(), merged_bytes) <= self.broadcast_bytes_max:
            return self._maybe_seen_broadcast(df, hash_col)
        return self.maybe_seen_join(df, hash_col)

    def _read_blob_rows(self, dirs: list[str]):
        """Driver-side pyarrow read of delta-blob rows from snapshot
        data dirs (local-fs paths; at object-store scale this is a
        bounded manifest-sized read — one small file-set per delta)."""
        import glob as _glob
        import os as _os

        import pyarrow.parquet as pq

        for d in dirs:
            base = _os.path.join(self.cat._tdir("seen"), d)
            for f in sorted(
                _glob.glob(_os.path.join(base, "**", "*.parquet"), recursive=True)
            ):
                t = pq.read_table(
                    f, columns=["shard", "kind", "nbits", "nhashes", "filter"]
                )
                for i in range(t.num_rows):
                    yield (
                        int(t["shard"][i].as_py()), t["kind"][i].as_py(),
                        int(t["nbits"][i].as_py()), int(t["nhashes"][i].as_py()),
                        t["filter"][i].as_py(),
                    )

    def _merged_blobs(self) -> dict[int, list]:
        """Per-shard OR-merged blob lists, incrementally maintained:
        only snapshot dirs not yet reflected in the cache are read.
        A rollback (cached dir no longer referenced) rebuilds cold —
        an over-approximating stale cache would silently drop
        genuinely-new urls in approx mode."""
        v = self.cat.current_version("seen")
        if v == self._cache_version and self._merged is not None:
            return self._merged
        if self._dir_layout:
            snap = self.cat._read_snapshot("seen", v)
            cur = set(snap["dirs"])
            if self._merged is None or not self._cache_dirs <= cur:
                self._merged, self._cache_dirs = {}, set()
            new_dirs = sorted(cur - self._cache_dirs)
            rows_iter = self._read_blob_rows(new_dirs)
        else:
            # non-dir catalog: no per-dir incremental read; rebuild
            # the cache cold from a Spark collect on version change
            # (rows = n_shards x un-compacted deltas, blob payloads —
            # the same bounded volume the dir path reads via pyarrow)
            self._merged, self._cache_dirs, new_dirs = {}, set(), []
            rows_iter = (
                (int(r.shard), r.kind, int(r.nbits), int(r.nhashes),
                 bytes(r.filter))
                for r in self.cat.read("seen", v).collect()
            )
        for s, kind, nb, nh, blob in rows_iter:
            lst = self._merged.setdefault(s, [])
            if kind in ("bloom", "bloomsp") and (
                not lst
                or (lst[0][0] == "bloom" and lst[0][1] == nb and lst[0][2] == nh)
            ):
                bits = (
                    np.frombuffer(lst[0][3], dtype=np.uint8).copy()
                    if lst else np.zeros(nb // 8, dtype=np.uint8)
                )
                _or_blob_into(bits, kind, bytes(blob))
                entry = ("bloom", nb, nh, bits.tobytes())
                if lst:
                    lst[0] = entry
                else:
                    lst.append(entry)
            else:
                lst.append((kind, nb, nh, bytes(blob)))
        self._cache_dirs |= set(new_dirs)
        self._cache_version = v
        return self._merged

    def _maybe_seen_broadcast(self, df, hash_col: str):
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        merged = self._merged_blobs()
        if not merged:
            return df.withColumn("maybe_seen", F.lit(False))
        if self._bcast is not None and self._bcast[0] == self._cache_version:
            b = self._bcast[1]
        else:
            if self._bcast is not None:
                # previous round's jobs are done; free the old blobs
                try:
                    self._bcast[1].unpersist()
                except Exception:
                    pass
            b = self.cat.spark.sparkContext.broadcast(merged)
            self._bcast = (self._cache_version, b)
        n_shards = self.n_shards

        @F.pandas_udf(T.BooleanType())
        def member(keys: pd.Series) -> pd.Series:
            ks = keys.to_numpy(dtype=np.int64)
            shards = (ks % n_shards + n_shards) % n_shards
            out = np.zeros(len(ks), dtype=bool)
            for s in np.unique(shards):
                lst = b.value.get(int(s))
                if not lst:
                    continue
                mask = shards == s
                sub = ks[mask]
                hit = np.zeros(len(sub), dtype=bool)
                for kind, nb, nh, blob in lst:
                    hit |= _blob_contains(kind, nb, nh, blob, sub)
                out[mask] = hit
            return pd.Series(out, index=keys.index)

        return df.withColumn("maybe_seen", member(F.col(hash_col)))

    def maybe_seen_join(self, df, hash_col: str = "url_hash"):
        """Shard-join membership: candidates cogrouped with their
        shard's blob rows; each task probes one shard's blobs. Scales
        to blob totals far beyond broadcast (10^10-key territory) —
        the only driver involvement is the manifest read."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        keyed = df.withColumn(
            "__shard",
            F.pmod(F.col(hash_col), F.lit(self.n_shards)).cast("int"),
        )
        seen = self.cat.read("seen")
        out_schema = T.StructType(
            [f for f in keyed.schema.fields if f.name != "__shard"]
            + [T.StructField("maybe_seen", T.BooleanType())]
        )
        cols = [f.name for f in keyed.schema.fields if f.name != "__shard"]
        hcol = hash_col

        def check(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0:
                return pd.DataFrame(columns=cols + ["maybe_seen"])
            ks = left[hcol].to_numpy(dtype=np.int64)
            hit = np.zeros(len(ks), dtype=bool)
            for _, r in right.iterrows():  # few rows: one blob per add()
                hit |= _blob_contains(
                    r["kind"], int(r["nbits"]), int(r["nhashes"]),
                    bytes(r["filter"]), ks,
                )
            out = left[cols].copy()
            out["maybe_seen"] = hit
            return out

        return (
            keyed.groupBy("__shard")
            .cogroup(seen.groupBy("shard"))
            .applyInPandas(check, schema=out_schema)
        )
