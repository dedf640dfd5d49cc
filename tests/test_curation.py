"""Corpus-curation kernels: split buckets, PII redaction, histogram math."""

import duckdb
import pytest

from deed_ocr_ray.pipelines.curation import (
    _split_bucket,
    redact_pii,
)


def test_split_bucket_matches_duckdb_md5():
    """The Python bucket must be bit-identical to the oracle's
    ('0x'||substr(md5(x),1,8))::UBIGINT % 100 expression."""
    ids = list(range(50)) + [999, 123456789, 2**40]
    rows = duckdb.sql(
        "SELECT i, CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8))::UBIGINT % 100 "
        "AS BIGINT) FROM (SELECT unnest($ids) AS i)",
        params={"ids": ids},
    ).fetchall()
    for i, want in rows:
        assert _split_bucket(i) == want, i


def test_split_bucket_distribution_roughly_uniform():
    buckets = [_split_bucket(i) for i in range(10_000)]
    from collections import Counter

    c = Counter(buckets)
    assert len(c) == 100
    assert max(c.values()) < 200 and min(c.values()) > 40  # ~100 +/- 5 sigma


def test_redact_pii_kernel():
    clean, n_e, n_p = redact_pii(
        "mail a.b_c%d+e@sub.example.co.uk or x@y.io, call 555-123-4567 "
        "but not 55-123-4567 or 555-1234-567"
    )
    assert n_e == 2 and n_p == 1
    assert "<EMAIL>" in clean and "<PHONE>" in clean
    assert "@" not in clean
    assert "555-123-4567" not in clean
    assert "55-123-4567" in clean  # non-matching shapes untouched
    # idempotent: placeholders contain no PII shapes
    again, e2, p2 = redact_pii(clean)
    assert again == clean and e2 == 0 and p2 == 0


def test_redact_pii_total_on_edge_inputs():
    for s in ("", "@", "a@b", "555-", "@@@@", "a@b.cd"):
        clean, n_e, n_p = redact_pii(s)
        assert isinstance(clean, str)
    # minimal valid email
    assert redact_pii("a@b.cd")[1] == 1


def test_redact_matches_duckdb_regex():
    """Python re and DuckDB RE2 must agree on these patterns (the
    oracle depends on it)."""
    from deed_ocr_ray.pipelines.curation import EMAIL_PAT, PHONE_PAT

    samples = [
        "x user7@mail3.example.org y 555-100-1000 z",
        "no pii here",
        "a@b.cd 123-456-7890 tail",
        "double a@b.cd c@d.ef 999-999-9999 888-888-8888",
    ]
    for s in samples:
        want = duckdb.sql(
            "SELECT regexp_replace(regexp_replace($s, $e, '<EMAIL>', 'g'), "
            "$p, '<PHONE>', 'g')",
            params={"s": s, "e": EMAIL_PAT, "p": PHONE_PAT},
        ).fetchone()[0]
        assert redact_pii(s)[0] == want, s


def test_bit_length_bucket_matches_duckdb_bin():
    rows = duckdb.sql(
        "SELECT n, length(bin(GREATEST(n, 1))) FROM "
        "(SELECT unnest([0, 1, 2, 3, 4, 7, 8, 255, 256, 1000, 65535]) AS n)"
    ).fetchall()
    for n, want in rows:
        assert max(n, 1).bit_length() == want, n


# ---------------------------------- pipeline fixtures for the new ops

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def _oracle(tmp_path, sql, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _hash(df):
    df = df[sorted(df.columns)]
    return sorted(repr(tuple(r)) for r in df.itertuples(index=False, name=None))


# ------------------------------------------------ source mixture

def test_source_mixture_matches_oracle(ray_session, tmp_path):
    from deed_ocr_ray.pipelines.curation import Q_SOURCE_MIXTURE_SQL, q_source_mixture

    rng = np.random.default_rng(3)
    n = 800
    docs = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "source": pa.array(rng.choice([f"src{i}" for i in range(8)], n).tolist(),
                           type=pa.string()),
    })
    _write(tmp_path, "documents", docs)
    got = q_source_mixture(str(tmp_path)).to_pandas()
    want = _oracle(tmp_path, Q_SOURCE_MIXTURE_SQL, ["documents"])
    assert _hash(got) == _hash(want)
    # src3 (weight 100) keeps everything; kept fraction tracks the weight
    kept = got.groupby("source")["doc_id"].count()
    total = pd.Series(docs["source"].to_pylist()).value_counts()
    assert kept["src3"] == total["src3"]
    assert kept["src0"] < total["src0"]  # weight 25


def test_mixture_weight_rule():
    from deed_ocr_ray.pipelines.curation import _mixture_weight_pct

    assert _mixture_weight_pct("src0") == 25
    assert _mixture_weight_pct("src1") == 50
    assert _mixture_weight_pct("src2") == 75
    assert _mixture_weight_pct("src3") == 100
    assert _mixture_weight_pct("src4") == 25
    assert _mixture_weight_pct("books") == 100  # unknown name: keep all


# ------------------------------------------------ token budget

def test_token_budget_matches_oracle_and_stops_at_budget(ray_session, tmp_path):
    from deed_ocr_ray.pipelines.curation import q_token_budget, token_budget_sql

    rng = np.random.default_rng(6)
    n = 300
    texts = [" ".join(["w"] * int(k)) + ("...!!" if i % 3 == 0 else "")
             for i, k in enumerate(rng.integers(5, 60, n))]
    docs = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    _write(tmp_path, "documents", docs)
    budget = 2000
    got = q_token_budget(str(tmp_path), budget=budget).to_pandas()
    want = _oracle(tmp_path, token_budget_sql(budget), ["documents"])
    assert _hash(got) == _hash(want)
    assert 0 < len(got) < n               # a strict subset was selected
    assert got["cum_tokens"].max() <= budget
    assert got["words"].sum() == got["cum_tokens"].max()


def test_token_budget_boundary_inclusive(ray_session, tmp_path):
    """A doc landing exactly ON the budget is kept; the next is cut."""
    from deed_ocr_ray.pipelines.curation import q_token_budget

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["a b c", "d e f", "g h i"], type=pa.string()),
    })
    _write(tmp_path, "documents", docs)
    got = q_token_budget(str(tmp_path), budget=6).to_pandas()
    assert len(got) == 2 and got["cum_tokens"].tolist() == [3, 6]


# ------------------------------------------------ decontamination

def test_decontaminate_matches_oracle(ray_session, tmp_path):
    from deed_ocr_ray.pipelines.curation import decontaminate_sql, q_decontaminate

    rng = np.random.default_rng(8)
    vocab = [f"t{i}" for i in range(30)]
    texts = []
    n = 160
    for i in range(n):
        toks = rng.choice(vocab, rng.integers(4, 25)).tolist()
        texts.append(" ".join(toks))
    # plant an exact 8-token leak from benchmark doc 0 into doc 17
    leak = texts[0].split()[:8]
    if len(leak) == 8:
        texts[17] = texts[17] + " " + " ".join(leak)
    docs = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    _write(tmp_path, "documents", docs)
    got = q_decontaminate(str(tmp_path), n=8, bench_mod=40).to_pandas()
    want = _oracle(tmp_path, decontaminate_sql(8, 40), ["documents"])
    assert _hash(got) == _hash(want)
    assert (~got["doc_id"].isin(range(0, n, 40))).all()  # bench excluded
    if len(leak) == 8:
        assert bool(got.set_index("doc_id").loc[17, "contaminated"])


def test_decontaminate_short_docs_emit_zero_gram_rows(ray_session, tmp_path):
    from deed_ocr_ray.pipelines.curation import decontaminate_sql, q_decontaminate

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["a b c d e f g h i", "too short", "a b c d e f g h"],
                         type=pa.string()),
    })
    _write(tmp_path, "documents", docs)
    got = q_decontaminate(str(tmp_path), n=8, bench_mod=40).to_pandas()
    want = _oracle(tmp_path, decontaminate_sql(8, 40), ["documents"])
    assert _hash(got) == _hash(want)
    g = got.set_index("doc_id")
    assert g.loc[1, "n_grams"] == 0 and not g.loc[1, "contaminated"]
    # doc 2's full 8-gram is a prefix-gram of bench doc 0
    assert g.loc[2, "n_overlap"] == 1 and bool(g.loc[2, "contaminated"])
