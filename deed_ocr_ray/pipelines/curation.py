"""Corpus-curation operators: deterministic train/val/test splits, PII
redaction, per-domain stats, length histograms, exact-integer TF-IDF
term stats.

The round-3 widening of the training-data operator family (driver
brief): everything a curation pass runs between extraction and packing.
Every operator here is a single vectorized ``map_batches`` or a
partial-aggregate → slim groupby — no all-to-all beyond the final
keyed aggregate — and every one has a value-hash DuckDB oracle
(synthesized inputs are generated IDENTICALLY in SQL, the
``url_canon`` pattern, so the operator itself is what the hash
verifies).

Reference analogues: the split/filter/annotate steps of
deed_ocr/workflow.py's per-document pass (classify → annotate →
emit), generalized to corpus scale.
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

# ------------------------------------------------- stratified hash split

def _split_bucket(doc_id: int) -> int:
    """Deterministic 0-99 bucket: first 8 hex chars of md5(str(doc_id)).
    Bit-identical to DuckDB ``('0x'||substr(md5(x),1,8))::UBIGINT % 100``."""
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100


def q_stratified_split(sf_dir: str, test_pct: int = 5, val_pct: int = 5) -> "ray.data.Dataset":
    """Deterministic train/val/test assignment by content-independent
    hash bucket — the reproducible split every training-data pipeline
    needs (stable under re-runs, insensitive to row order, no RNG
    state). Stateless map, no shuffle.
    Columns: doc_id, bucket, split."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        buckets = [_split_bucket(i) for i in ids]
        splits = [
            "test" if b < test_pct else ("val" if b < test_pct + val_pct else "train")
            for b in buckets
        ]
        return pa.table({
            "doc_id": t["doc_id"],
            "bucket": pa.array(buckets, type=pa.int64()),
            "split": pa.array(splits, type=pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_split_sql(test_pct: int = 5, val_pct: int = 5) -> str:
    return f"""
SELECT doc_id,
       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
            AS BIGINT) AS bucket,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
                 < {int(test_pct)} THEN 'test'
            WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
                 < {int(test_pct) + int(val_pct)} THEN 'val'
            ELSE 'train' END AS split
FROM documents
"""


Q_STRATIFIED_SPLIT_SQL = stratified_split_sql()


def q_split_stats(sf_dir: str, test_pct: int = 5, val_pct: int = 5) -> "ray.data.Dataset":
    """Stratification check: docs per (lang, split) — how balanced the
    hash split is across language strata. Partial counts inside each
    batch, then a slim (lang, split, n) groupby.
    Columns: lang, split, n_docs."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        counts: dict = {}
        for i, lang in zip(t["doc_id"].to_pylist(), langs):
            b = _split_bucket(i)
            s = "test" if b < test_pct else ("val" if b < test_pct + val_pct else "train")
            counts[(lang, s)] = counts.get((lang, s), 0) + 1
        keys = sorted(counts)
        return pa.table({
            "lang": pa.array([k[0] for k in keys], type=pa.string()),
            "split": pa.array([k[1] for k in keys], type=pa.string()),
            "n": pa.array([counts[k] for k in keys], type=pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "split"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )


def split_stats_sql(test_pct: int = 5, val_pct: int = 5) -> str:
    return f"""
SELECT lang,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
                 < {int(test_pct)} THEN 'test'
            WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
                 < {int(test_pct) + int(val_pct)} THEN 'val'
            ELSE 'train' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1, 2
"""


Q_SPLIT_STATS_SQL = split_stats_sql()


# --------------------------------------------------------- PII redaction

# RE2-safe patterns (no backrefs/lookaheads), identical semantics in
# Python re and DuckDB regexp_* — emails first, then phones.
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PAT = r"\b\d{3}-\d{3}-\d{4}\b"
_EMAIL_RE = re.compile(EMAIL_PAT)
_PHONE_RE = re.compile(PHONE_PAT)


def redact_pii(text: str) -> tuple:
    """``(clean_text, n_emails, n_phones)`` — emails then phones
    replaced with typed placeholders."""
    clean, n_emails = _EMAIL_RE.subn("<EMAIL>", text)
    clean, n_phones = _PHONE_RE.subn("<PHONE>", clean)
    return clean, n_emails, n_phones


def q_pii_redact(sf_dir: str) -> "ray.data.Dataset":
    """PII scrub over deterministic PII-bearing docs (the sf tables
    carry no contact strings, so email/phone suffixes are synthesized
    from doc_id — IDENTICALLY in the oracle, so the redaction kernel is
    what the hash verifies). One vectorized map, no shuffle; at corpus
    scale this is a pre-release compliance pass.
    Columns: doc_id, n_emails, n_phones, clean_text."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        out_n_e: List[int] = []
        out_n_p: List[int] = []
        out_txt: List[str] = []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            full = text
            if did % 2 == 0:
                full += f" Contact user{did}@mail{did % 7}.example.org now."
            if did % 3 == 0:
                full += f" Call 555-{100 + did % 900}-{1000 + did % 9000}."
            clean, n_e, n_p = redact_pii(full)
            out_n_e.append(n_e)
            out_n_p.append(n_p)
            out_txt.append(clean)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_emails": pa.array(out_n_e, type=pa.int64()),
            "n_phones": pa.array(out_n_p, type=pa.int64()),
            "clean_text": pa.array(out_txt, type=pa.string()),
        })

    return ds.map_batches(scrub, batch_format="pyarrow")


Q_PII_REDACT_SQL = rf"""
WITH raw AS (
  SELECT doc_id,
    text ||
    CASE WHEN doc_id % 2 = 0
         THEN ' Contact user' || doc_id || '@mail' || (doc_id % 7) ||
              '.example.org now.' ELSE '' END ||
    CASE WHEN doc_id % 3 = 0
         THEN ' Call 555-' || (100 + doc_id % 900) || '-' ||
              (1000 + doc_id % 9000) || '.' ELSE '' END AS full_text
  FROM documents
)
SELECT doc_id,
  CAST(length(regexp_extract_all(full_text, '{EMAIL_PAT}')) AS BIGINT) AS n_emails,
  CAST(length(regexp_extract_all(
      regexp_replace(full_text, '{EMAIL_PAT}', '<EMAIL>', 'g'),
      '{PHONE_PAT}')) AS BIGINT) AS n_phones,
  regexp_replace(
      regexp_replace(full_text, '{EMAIL_PAT}', '<EMAIL>', 'g'),
      '{PHONE_PAT}', '<PHONE>', 'g') AS clean_text
FROM raw
"""


# -------------------------------------------------------- domain rollup

def q_domain_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-domain corpus stats (domain synthesized from ``source`` the
    same way the url_canon family does — IDENTICAL synthesis in the
    oracle). Per-batch partials shrink the exchange to one row per
    (domain, batch); text column is never read (``n_chars`` is in the
    table). Columns: domain, n_docs, total_chars, avg_chars."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for src, n in zip(t["source"].to_pylist(), t["n_chars"].to_pylist()):
            dom = f"www.{src}.example.com"
            c = counts.setdefault(dom, [0, 0])
            c[0] += 1
            c[1] += int(n)
        keys = sorted(counts)
        return pa.table({
            "domain": pa.array(keys, type=pa.string()),
            "n": pa.array([counts[k][0] for k in keys], type=pa.int64()),
            "chars": pa.array([counts[k][1] for k in keys], type=pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(Sum("n", alias_name="n_docs"),
                   Sum("chars", alias_name="total_chars"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_docs"].to_pylist(), dtype=np.float64)
        c = np.asarray(t["total_chars"].to_pylist(), dtype=np.float64)
        avg = np.divide(c, n, out=np.zeros_like(c), where=n > 0)
        return pa.table({
            "domain": t["domain"],
            "n_docs": t["n_docs"],
            "total_chars": t["total_chars"],
            "avg_chars": pa.array(avg, type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


Q_DOMAIN_STATS_SQL = """
SELECT 'www.' || source || '.example.com' AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents GROUP BY 1
"""


# ---------------------------------------------------- length histogram

def q_length_histogram(sf_dir: str) -> "ray.data.Dataset":
    """Power-of-two document-length histogram — the size-distribution
    profile a curation pass reads before choosing batch/window sizes.
    Integer-exact bucketing (bit_length, no float log); per-batch
    partials, slim groupby. Columns: bucket, lo_chars, hi_chars,
    n_docs, total_chars."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for n in t["n_chars"].to_pylist():
            b = max(int(n), 1).bit_length()
            c = counts.setdefault(b, [0, 0])
            c[0] += 1
            c[1] += int(n)
        keys = sorted(counts)
        return pa.table({
            "bucket": pa.array(keys, type=pa.int64()),
            "n": pa.array([counts[k][0] for k in keys], type=pa.int64()),
            "chars": pa.array([counts[k][1] for k in keys], type=pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n_docs"),
                   Sum("chars", alias_name="total_chars"))
    )

    def finish(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_pylist()
        return pa.table({
            "bucket": t["bucket"],
            "lo_chars": pa.array([1 << (x - 1) for x in b], type=pa.int64()),
            "hi_chars": pa.array([(1 << x) - 1 for x in b], type=pa.int64()),
            "n_docs": t["n_docs"],
            "total_chars": t["total_chars"],
        })

    return agg.map_batches(finish, batch_format="pyarrow")


Q_LENGTH_HISTOGRAM_SQL = """
SELECT bucket,
       CAST(1 << (bucket - 1) AS BIGINT) AS lo_chars,
       CAST((1 << bucket) - 1 AS BIGINT) AS hi_chars,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT CAST(length(bin(GREATEST(n_chars, 1))) AS BIGINT) AS bucket, n_chars
  FROM documents
) GROUP BY 1
"""


# -------------------------------------- exact-integer TF-IDF term stats

def q_term_stats(sf_dir: str, min_len: int = 7, k: int = 50) -> "ray.data.Dataset":
    """Document frequency + term frequency for long terms, with the
    corpus size — the exact-INTEGER components of TF-IDF (idf =
    log(n_docs/df) is one float away, computed client-side; keeping the
    operator integer-exact makes it oracle-hashable). Each doc is one
    row, so per-batch (term, doc) rows are globally distinct: df is a
    Count and tf a Sum after ONE slim groupby.
    Columns: term, df, tf, n_docs."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    n_docs = ds.count()

    def pairs(t: pa.Table) -> pa.Table:
        terms: List[str] = []
        cnts: List[int] = []
        for text in t["text"].to_pylist():
            local: dict = {}
            for w in text.split():
                if len(w) >= min_len:
                    local[w] = local.get(w, 0) + 1
            terms.extend(local.keys())
            cnts.extend(local.values())
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            "cnt": pa.array(cnts, type=pa.int64()),
        })

    agg = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="df"), Sum("cnt", alias_name="tf"))
    )
    top = agg.sort(["df", "term"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda t: t.append_column(
            "n_docs", pa.array([n_docs] * len(t), type=pa.int64())),
        batch_format="pyarrow",
    )


def term_stats_sql(min_len: int = 7, k: int = 50) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM documents WHERE trim(text) <> ''
),
f AS (
  SELECT term, doc_id, COUNT(*) AS cnt FROM toks
  WHERE length(term) >= {int(min_len)} GROUP BY 1, 2
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(cnt) AS BIGINT) AS tf,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs
FROM f GROUP BY term
ORDER BY df DESC, term ASC LIMIT {int(k)}
"""


Q_TERM_STATS_SQL = term_stats_sql()


# -------------------------------------- deterministic stratified sample

def q_stratified_sample(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Fixed-size deterministic sample PER STRATUM (language): the k
    docs with the smallest ``md5(doc_id)`` in each lang — the
    reproducible per-group sampler (companion to ``stratified_split``,
    which partitions ALL docs; this picks a bounded audit/eval set per
    stratum, stable under re-runs and row order).

    Grouped-top-k shape: each batch keeps only its local k smallest
    (lang, h) rows (combiner — the exchange carries at most
    k × strata × blocks slim rows, never the corpus), then one slim
    groupby resolves the global per-stratum top-k. Ties are impossible
    (md5 over distinct ids), but doc_id breaks them deterministically
    anyway, matching the oracle's ORDER BY.
    Columns: lang, doc_id, h, rk.
    """

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])

    def local_topk(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "lang": t["lang"].to_pylist(),
            "doc_id": t["doc_id"].to_pylist(),
        })
        df["h"] = [hashlib.md5(str(i).encode()).hexdigest() for i in df["doc_id"]]
        df = df.sort_values(["lang", "h", "doc_id"]).groupby("lang", sort=False).head(k)
        return pa.table({
            "lang": pa.array(df["lang"].tolist(), type=pa.string()),
            "doc_id": pa.array(df["doc_id"].to_numpy(), type=pa.int64()),
            "h": pa.array(df["h"].tolist(), type=pa.string()),
        })

    def resolve(g) -> pa.Table:
        g = g.sort_values(["h", "doc_id"]).head(k)
        return pa.table({
            "lang": pa.array(g["lang"].tolist(), type=pa.string()),
            "doc_id": pa.array(g["doc_id"].to_numpy(), type=pa.int64()),
            "h": pa.array(g["h"].tolist(), type=pa.string()),
            "rk": pa.array(np.arange(1, len(g) + 1, dtype=np.int64), type=pa.int64()),
        })

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("lang")  # strata are few — per-key map_groups is fine
        .map_groups(resolve, batch_format="pandas")
    )


def stratified_sample_sql(k: int = 10) -> str:
    return f"""
SELECT lang, doc_id, h, CAST(rk AS BIGINT) AS rk FROM (
  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= {int(k)}
"""


Q_STRATIFIED_SAMPLE_SQL = stratified_sample_sql()
