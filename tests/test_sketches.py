"""Bloom semi-join + count-min heavy hitters: kernel guarantees
(no false negatives, never-underestimate), estimate-vs-exact audits,
and end-to-end oracle parity on crafted fixtures."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from deed_ocr_ray.pipelines.sketches import (
    CMS_D,
    CMS_W,
    bloom_contains,
    bloom_from_keys,
    cms_estimate,
    cms_update,
    _term_hash,
)


# ------------------------------------------------------- bloom kernel

def test_bloom_no_false_negatives():
    keys = np.arange(0, 200_000, 7, dtype=np.int64)
    bits = bloom_from_keys(keys)
    assert bloom_contains(bits, keys).all()


def test_bloom_false_positive_rate_bounded():
    rng = np.random.default_rng(11)
    members = rng.integers(0, 2**62, size=20_000).astype(np.int64)
    bits = bloom_from_keys(members)
    probe = rng.integers(0, 2**62, size=50_000).astype(np.int64)
    probe = probe[~np.isin(probe, members)]
    fp = bloom_contains(bits, probe).mean()
    # m=2^20 bits, n=20k, k=5 -> theoretical fp ~ (1-e^{-kn/m})^k ~ 0.55%
    assert fp < 0.02, fp


def test_bloom_merge_is_bitwise_or():
    a = np.arange(1000, dtype=np.int64)
    b = np.arange(1000, 2000, dtype=np.int64)
    merged = np.bitwise_or(bloom_from_keys(a), bloom_from_keys(b))
    both = bloom_from_keys(np.concatenate([a, b]))
    assert np.array_equal(merged, both)


# -------------------------------------------------- bloom semi-join op

def test_bloom_semijoin_matches_plain_semijoin(ray_session, tmp_path):
    from deed_ocr_ray.pipelines.sketches import bloom_semijoin_sql, q_bloom_semijoin

    rng = np.random.default_rng(5)
    n_ord, n_li = 2_000, 12_000
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), type=pa.int64()),
        "o_totalprice": pa.array(rng.uniform(0, 500_000, n_ord), type=pa.float64()),
    })
    li = pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord * 2, n_li), type=pa.int64()),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li).tolist(),
                                 type=pa.string()),
        "l_extendedprice": pa.array(rng.uniform(900, 100_000, n_li),
                                    type=pa.float64()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))

    got = q_bloom_semijoin(str(tmp_path)).to_pandas().sort_values(
        "l_returnflag").reset_index(drop=True)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')")
    want = con.execute(
        bloom_semijoin_sql() + " ORDER BY l_returnflag").fetchdf()
    assert got["l_returnflag"].tolist() == want["l_returnflag"].tolist()
    assert got["n_items"].tolist() == want["n_items"].tolist()
    assert got["cents"].tolist() == want["cents"].tolist()


# --------------------------------------------------------- CMS kernel

def test_cms_never_underestimates():
    rng = np.random.default_rng(3)
    terms = [f"t{i}" for i in range(3000)]
    true = rng.integers(1, 50, size=len(terms)).astype(np.int64)
    true[0] = 100_000  # one heavy hitter
    counts = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    cms_update(counts, _term_hash(terms), true)
    est = cms_estimate(counts, _term_hash(terms))
    assert (est >= true).all()
    n_total = int(true.sum())
    # classic CMS error bound: est <= true + e/w * N with prob 1-(1/2)^d;
    # assert a generous multiple holds for ALL terms on this seed
    slack = int(np.ceil(2.7182818 / CMS_W * n_total)) * 4
    assert (est <= true + slack).all()
    # the heavy hitter's estimate is tight (collisions add < 1% here)
    assert est[0] < true[0] * 1.01


def test_cms_merge_linearity():
    terms = [f"w{i}" for i in range(500)]
    h = _term_hash(terms)
    w1 = np.arange(1, 501, dtype=np.int64)
    w2 = np.arange(500, 0, -1, dtype=np.int64)
    a = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    b = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    both = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    cms_update(a, h, w1)
    cms_update(b, h, w2)
    cms_update(both, h, w1 + w2)
    assert np.array_equal(a + b, both)


def test_heavy_hitters_audit_vs_exact(ray_session):
    """End-to-end estimate-vs-exact audit on the sf0.001 corpus: every
    reported estimate upper-bounds the true count, and the true top-5
    terms all appear in the reported top-20."""
    from deed_ocr_ray.pipelines.sketches import q_heavy_hitters

    sf = "/root/testdata/sf0.001"
    got = q_heavy_hitters(sf).to_pandas()
    exact = duckdb.sql(rf"""
        SELECT term, COUNT(*) c FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) term
          FROM read_parquet('{sf}/documents.parquet') WHERE trim(text) <> ''
        ) GROUP BY term ORDER BY c DESC, term
    """).fetchdf().set_index("term")["c"]
    for term, est in zip(got["term"], got["est_cnt"]):
        assert est >= exact.get(term, 0), term
    top5 = set(exact.head(5).index)
    assert top5 <= set(got["term"]), (top5, set(got["term"]))


# ------------------------------------------------- grouped HLL (DAU)

def test_dau_hll_audit_vs_exact(ray_session, tmp_path):
    """Per-day estimates within HLL error (~1.6% @ p=12; allow 5%),
    and merge order must not matter (register max is commutative)."""
    import pyarrow.parquet as pq

    from deed_ocr_ray.pipelines.sketches import q_dau_hll

    rng = np.random.default_rng(21)
    day_us = 86_400_000_000
    n = 40_000
    days = rng.integers(0, 5, n)
    users = rng.integers(0, 3_000, n)
    events = pa.table({
        "user_id": pa.array(users, type=pa.int64()),
        "ts": pa.array((days * day_us + rng.integers(0, day_us, n)).astype("int64"),
                       type=pa.timestamp("us")),
    })
    pq.write_table(events, str(tmp_path / "events.parquet"))
    got = q_dau_hll(str(tmp_path)).to_pandas().set_index("day")

    df = pd.DataFrame({"day": days, "user": users}).drop_duplicates()
    exact = df.groupby("day")["user"].nunique()
    assert len(got) == 5
    for d, exact_n in exact.items():
        day_key = str(np.datetime64(int(d), "D"))
        est = got.loc[day_key, "est_users"]
        assert abs(est - exact_n) / exact_n < 0.05, (day_key, est, exact_n)
