"""Deduplication operators: exact, MinHash+LSH, SimHash, pairwise Jaccard.

Corpus-scale generalizations of the reference's in-row dedup semantics
(D1 order-preserving exact dedup workflow.py:600-616; D2 similarity-
ranked near-dup suppression extractors/llm.py:167-193) to cross-row
operators, built shuffle-consciously:

* exact dedup hashes content inside ``map_batches`` and shuffles only
  ``(fp, doc_id)`` pairs — the text never crosses the exchange;
* MinHash+LSH explodes each doc into ``n_bands`` tiny band rows,
  ``groupby(band_id, band_hash)`` co-locates only colliding docs, and
  candidate verification happens per bucket (buckets are small by
  construction); signatures ride along in the band rows (64×u64 =
  512 B/doc) to avoid a second join — at much larger corpora trade
  that for a signature re-join;
* SimHash emits one 64-bit signature per doc (4×16-bit band blocking
  gives Hamming≤3 candidates without an O(n²) scan);
* pairwise char-Jaccard uses ``Dataset.join`` (hash-partitioned) and
  reproduces DuckDB's byte-set ``jaccard()`` exactly, so the oracle
  matches bit-for-bit.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min

# ------------------------------------------------------------- exact dedup

def q_exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Exact-duplicate groups by md5(text): representative = min doc_id
    (cross-row D1: first-occurrence-wins under a deterministic order).
    Columns: fp, rep_doc_id, n_copies."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"fp": pa.array(hashes, type=pa.string()), "doc_id": t["doc_id"]})

    pairs = ds.map_batches(fp, batch_format="pyarrow")
    return pairs.groupby("fp").aggregate(
        Min("doc_id", alias_name="rep_doc_id"), Count(alias_name="n_copies")
    )


Q_EXACT_DEDUP_SQL = """
SELECT md5(text) AS fp, MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


# ----------------------------------------------------------- minhash + LSH

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
_rng = np.random.RandomState(0xC0FFEE)
# Multiply-shift universal hashing with FULL-WIDTH uint64 wraparound:
# sig_j = min_s (a_j * h(s) + b_j mod 2^64). The wraparound is what makes
# each permutation non-monotone. (A first cut used (a*h+b) mod 2^61-1
# with a < 2^29, h < 2^32 to stay overflow-free — but then a*h+b can
# NEVER wrap, the map is monotone in h, every permutation selects the
# same minimum shingle, and MinHash degenerates to "equal min shingle
# => identical signature"; caught by q_minhash_validate.)
_PERM_A = (_rng.randint(0, 1 << 62, size=N_PERM).astype(np.uint64) << np.uint64(1)) | np.uint64(1)  # odd
_PERM_B = _rng.randint(0, 1 << 62, size=N_PERM).astype(np.uint64)
_FNV = np.uint32(16777619)


def _token_hashes(text: str) -> np.ndarray:
    """32-bit hashes of whitespace tokens (zlib.crc32: C-speed,
    deterministic, platform-stable)."""
    import zlib

    toks = text.split()
    if not toks:
        return np.zeros(1, dtype=np.uint32)
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in toks), dtype=np.uint32, count=len(toks)
    )


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct 32-bit hashes of word k-shingles. Word shingles (not
    char shingles) keep LSH buckets selective on natural-language-like
    text — char 5-grams collide on shared vocabulary alone and blow up
    bucket sizes quadratically."""
    th = _token_hashes(text)
    if len(th) < k:
        win = th[None, :]
        pows = _FNV ** np.arange(len(th) - 1, -1, -1, dtype=np.uint32)
    else:
        win = np.lib.stride_tricks.sliding_window_view(th, k)
        pows = _FNV ** np.arange(k - 1, -1, -1, dtype=np.uint32)
    with np.errstate(over="ignore"):
        h = (win * pows[None, :]).sum(axis=1, dtype=np.uint32)
    return np.unique(h)  # shingle SET semantics


def minhash_signature(text: str) -> np.ndarray:
    """64-perm MinHash signature (uint64[64]), vectorized:
    sig_j = min_s (a_j * h(s) + b_j mod 2^64) — multiply-shift family,
    wraparound intended (see _PERM_A note)."""
    h = _shingle_hashes(text).astype(np.uint64)
    with np.errstate(over="ignore"):
        vals = _PERM_A[:, None] * h[None, :] + _PERM_B[:, None]
    return vals.min(axis=1)


N_SHUFFLE_PARTS = 512  # coarse shuffle key: buckets per map_groups call


class MinHasher:
    """Actor: per-batch signatures + band explosion. Emits one SLIM row
    per (doc, band): (part, band_id, band_hash, doc_id) — 24 B/row.
    Signatures do NOT ride the shuffle (a 512 B sig repeated across 16
    band rows made the exchange 300x heavier than the keys); candidate
    pairs are verified afterwards against a broadcast signature store.

    ``part`` is a COARSE shuffle key (band_hash mod N_SHUFFLE_PARTS):
    grouping by the exact (band_id, band_hash) key makes Ray's
    ``map_groups`` call the UDF once per bucket — ~16 buckets/doc, all
    size 1, each paying a pandas-DataFrame construction (measured 34 s
    for 5k docs). Grouping by ``part`` and resolving exact buckets with
    a vectorized in-partition groupby cuts that to a few hundred UDF
    calls with identical results."""

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids: List[int] = []
        band_ids: List[int] = []
        band_hashes: List[int] = []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = minhash_signature(text)
            for b in range(N_BANDS):
                chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                bh = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
                ) >> 1  # fits int64
                doc_ids.append(did)
                band_ids.append(b)
                band_hashes.append(bh)
        return pa.table({
            "part": pa.array([h % N_SHUFFLE_PARTS for h in band_hashes], type=pa.int32()),
            "band_id": pa.array(band_ids, type=pa.int32()),
            "band_hash": pa.array(band_hashes, type=pa.int64()),
            "doc_id": pa.array(doc_ids, type=pa.int64()),
        })


def sig_matrix(sf_dir: str) -> "tuple[np.ndarray, np.ndarray]":
    """(doc_ids, signatures) for the whole documents table, computed
    distributed and collected driver-side. The sig store is
    64 perms x 8 B = 512 B/doc — the canonical broadcast small side at
    bench scale; at corpus scales where it no longer fits one node,
    replace the broadcast with two ``Dataset.join``s of the pair list
    against the signature table (doc_a then doc_b)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sigs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        mats = [minhash_signature(x) for x in t["text"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "sig": pa.array([m.tolist() for m in mats], type=pa.list_(pa.uint64())),
        })

    rows = ds.map_batches(sigs, batch_format="pyarrow").take_all()
    ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["sig"] for r in rows], dtype=np.uint64)
    return ids, mat


MAX_BUCKET = 64  # skip degenerate buckets (boilerplate collisions);
                 # dropped buckets are observable via bucket_overflow rows


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs for ALL exact (band_id, band_hash) buckets inside
    one coarse shuffle partition. Buckets larger than MAX_BUCKET are
    skipped (quadratic guard — the skew-cap analogue for hot keys); at
    production scale log/emit the overflow count rather than silently
    scanning. Singleton buckets (the overwhelming majority) are dropped
    by one vectorized duplicated() mask before any per-bucket work."""
    rows = []
    dup = g.duplicated(["band_id", "band_hash"], keep=False)
    for _, sub in g[dup].groupby(["band_id", "band_hash"], sort=False):
        if len(sub) > MAX_BUCKET:
            continue
        docs = sorted(set(sub["doc_id"]))
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                rows.append((int(docs[i]), int(docs[j])))
    # typed output even when EMPTY: an empty object-dtype DataFrame
    # yields a null-typed Arrow block, and mixed block schemas push the
    # downstream shuffle onto a slow unification path (measured 23 s ->
    # 2 s on the pair-dedup groupby).
    return pa.table({
        "doc_a": pa.array([r[0] for r in rows], type=pa.int64()),
        "doc_b": pa.array([r[1] for r in rows], type=pa.int64()),
    })


class _SigVerifier:
    """Actor: estimate Jaccard for candidate pairs from the broadcast
    signature store (fetched once per actor from the object store)."""

    def __init__(self, sig_ref) -> None:
        import ray as _ray

        ids, mat = _ray.get(sig_ref)
        self.row_of = {int(d): i for i, d in enumerate(ids)}
        self.mat = mat

    def __call__(self, t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy()
        b = t["doc_b"].to_numpy()
        ia = np.fromiter((self.row_of[int(x)] for x in a), dtype=np.int64, count=len(a))
        ib = np.fromiter((self.row_of[int(x)] for x in b), dtype=np.int64, count=len(b))
        est = (self.mat[ia] == self.mat[ib]).mean(axis=1)
        return pa.table({
            "doc_a": t["doc_a"],
            "doc_b": t["doc_b"],
            "est_jaccard": pa.array(est, type=pa.float64()),
        })


def q_minhash_pairs(sf_dir: str, min_est: float = 0.5) -> "ray.data.Dataset":
    """MinHash-LSH near-duplicate pairs (est. Jaccard >= ``min_est``).
    Columns: doc_a, doc_b, est_jaccard. (No SQL oracle: sketch-based.)"""
    import ray as _ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bands = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=(1, 8))
    pairs = bands.groupby("part").map_groups(_bucket_pairs, batch_format="pandas")
    # a pair can surface from several bands -> exact dedup on the slim
    # pair rows, then one vectorized verification pass
    uniq = pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))
    uniq = uniq.drop_columns(["n_bands"])
    sig_ref = _ray.put(sig_matrix(sf_dir))
    verified = uniq.map_batches(
        _SigVerifier, fn_constructor_args=(sig_ref,),
        batch_format="pyarrow", concurrency=(1, 4),
    )
    import pyarrow.compute as pc

    return verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t["est_jaccard"], min_est)),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------------ simhash

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (blake2b token hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split():
        h = int.from_bytes(hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def q_simhash(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc 64-bit SimHash (as int64, two's complement).
    Columns: doc_id, simhash. (No SQL oracle: sketch-based.)"""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        raw = [simhash64(x) for x in t["text"].to_pylist()]
        hs = [h - (1 << 64) if h >= (1 << 63) else h for h in raw]
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(hs, type=pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_simhash_near_pairs(sf_dir: str, max_hamming: int = 3) -> "ray.data.Dataset":
    """SimHash near-dup pairs via 4×16-bit band blocking (any pair with
    Hamming distance <= 3 shares at least one exact 16-bit band).
    Columns: doc_a, doc_b, hamming. (No SQL oracle.)"""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bands(t: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_vals, sims = [], [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            h = simhash64(text)
            for b in range(4):
                doc_ids.append(did)
                band_ids.append(b)
                band_vals.append((h >> (16 * b)) & 0xFFFF)
                sims.append(h - (1 << 64 if h >= (1 << 63) else 0))
        part = [(b * 65536 + v) % N_SHUFFLE_PARTS
                for b, v in zip(band_ids, band_vals)]
        return pa.table({
            "part": pa.array(part, type=pa.int32()),
            "band_id": pa.array(band_ids, type=pa.int32()),
            "band_val": pa.array(band_vals, type=pa.int32()),
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "simhash": pa.array(sims, type=pa.int64()),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # coarse-partition group; resolve exact buckets vectorized
        # (see MinHasher docstring for why not groupby the exact key)
        rows = []
        dup = g.duplicated(["band_id", "band_val"], keep=False)
        for _, sub in g[dup].groupby(["band_id", "band_val"], sort=False):
            docs = sorted(zip(sub["doc_id"], sub["simhash"]), key=lambda x: x[0])
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    a, ha = docs[i]
                    b, hb = docs[j]
                    d = bin((int(ha) ^ int(hb)) & ((1 << 64) - 1)).count("1")
                    if d <= max_hamming:
                        rows.append((int(a), int(b), d))
        return pa.table({  # typed even when empty (see _bucket_pairs)
            "doc_a": pa.array([r[0] for r in rows], type=pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], type=pa.int64()),
            "hamming": pa.array([r[2] for r in rows], type=pa.int64()),
        })

    exploded = ds.map_batches(bands, batch_format="pyarrow")
    cand = exploded.groupby("part").map_groups(pairs, batch_format="pandas")
    return cand.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


# --------------------------------------------- pairwise jaccard (join demo)

def duckdb_jaccard(a: str, b: str) -> float:
    """DuckDB ``jaccard()`` semantics exactly: similarity of the sets of
    BYTES of the UTF-8 encodings (case-sensitive). Exact doubles: the
    division of two small ints is bit-identical in both engines."""
    sa, sb = set(a.encode("utf-8")), set(b.encode("utf-8"))
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def q_jaccard_adjacent(sf_dir: str) -> "ray.data.Dataset":
    """Char-set Jaccard between each doc and doc_id+1 via a
    hash-partitioned ``Dataset.join`` (the both-sides-large join path).
    Columns: doc_id, jacc."""
    left = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    right = left.map_batches(
        lambda t: pa.table({
            "next_id": pa.compute.add(t["doc_id"], 1),
            "text_b": t["text"],
        }),
        batch_format="pyarrow",
    )
    joined = left.join(right, join_type="inner", num_partitions=8,
                       on=("doc_id",), right_on=("next_id",))

    def jac(t: pa.Table) -> pa.Table:
        vals = [duckdb_jaccard(a, b)
                for a, b in zip(t["text"].to_pylist(), t["text_b"].to_pylist())]
        return pa.table({"doc_id": t["doc_id"],
                         "jacc": pa.array(vals, type=pa.float64())})

    return joined.map_batches(jac, batch_format="pyarrow")


Q_JACCARD_ADJ_SQL = """
SELECT b.doc_id AS doc_id, jaccard(b.text, a.text) AS jacc
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
"""


# ------------------------------------------------------- HyperLogLog sketch

HLL_P = 12  # 2^12 registers -> ~1.6% standard error


def _hll_registers(ids: np.ndarray) -> np.ndarray:
    """Register array for a batch of 64-bit-hashed ids (vectorized)."""
    # splitmix64-style avalanche (public constant mixing)
    x = ids.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x ^= x >> np.uint64(30); x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27); x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    bucket = (x >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = x << np.uint64(HLL_P)  # remaining 64-p bits, left-aligned
    # rank = leading zeros of rest + 1 (capped)
    rank = np.ones(len(x), dtype=np.uint8)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        rank[mask] += np.uint8(shift)
        cur[mask] = cur[mask] << np.uint64(shift)
    regs = np.zeros(1 << HLL_P, dtype=np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Raw HLL estimate with the standard small-range (linear counting)
    correction — the original Flajolet et al. formulas."""
    m = float(len(regs))
    inv = np.power(2.0, -regs.astype(np.float64)).sum()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / inv
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return e


def q_hll_users(sf_dir: str) -> "ray.data.Dataset":
    """Approximate distinct user count over events via a mergeable
    HyperLogLog: each batch emits its register array (4 KiB), registers
    OR-merge driver-side (at cluster scale: tree-reduce the tiny
    sketches). Self-validating output row carries the exact count too.
    Columns: estimate, exact, rel_err_pct. (No SQL oracle: sketch.)"""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        regs = _hll_registers(t["user_id"].to_numpy().astype(np.uint64))
        return pa.table({"regs": pa.array([regs.tolist()], type=pa.list_(pa.uint8()))})

    parts = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    merged = np.zeros(1 << HLL_P, dtype=np.uint8)
    for r in parts:
        merged = np.maximum(merged, np.asarray(r["regs"], dtype=np.uint8))
    est = hll_estimate(merged)

    import duckdb  # exact side for self-validation (tiny query)

    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    rel = abs(est - exact) / exact * 100.0 if exact else 0.0
    return ray.data.from_items([{
        "estimate": int(round(est)), "exact": int(exact),
        "rel_err_pct": round(rel, 2),
    }])


# ----------------------------------------------- minhash estimate validation

def q_minhash_validate(sf_dir: str) -> "ray.data.Dataset":
    """For every MinHash-LSH pair, compute the EXACT word-shingle
    Jaccard alongside the signature estimate (the sketch-quality audit a
    production dedup pipeline ships with). Shingle-hash sets are
    broadcast like the signature store. Columns: doc_a, doc_b,
    est_jaccard, exact_jaccard. (No SQL oracle: sketch internals.)"""
    import ray as _ray

    pairs = q_minhash_pairs(sf_dir)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def shingles(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "sh": pa.array(
                [_shingle_hashes(x).tolist() for x in t["text"].to_pylist()],
                type=pa.list_(pa.uint32())),
        })

    rows = ds.map_batches(shingles, batch_format="pyarrow").take_all()
    store = {int(r["doc_id"]): frozenset(r["sh"]) for r in rows}
    ref = _ray.put(store)

    class Exact:
        def __init__(self) -> None:
            self.store = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ex = []
            for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
                sa, sb = self.store[int(a)], self.store[int(b)]
                u = len(sa | sb)
                ex.append(len(sa & sb) / u if u else 0.0)
            return t.append_column("exact_jaccard", pa.array(ex, type=pa.float64()))

    return pairs.map_batches(Exact, batch_format="pyarrow", concurrency=(1, 4))
