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
