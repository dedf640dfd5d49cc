"""In-pytest oracle parity: a fast subset of the driver's DuckDB gate.

(The full gate over every query is tools/check_oracles.py; this keeps a
representative slice inside `python -m pytest -x -q`.)
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["lineitem", "orders", "customer", "supplier", "part", "nation", "region", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    return sorted(repr(tuple(r)) for r in df.itertuples(index=False, name=None))


PARITY = [
    ("q1_pricing_summary",),
    ("topk_orders",),
    ("events_hourly",),
    ("token_count",),
    ("fingerprint",),
    ("jaccard_adjacent",),
    ("knn_cosine",),
    ("running_total",),
    ("order_rank",),
    ("customers_no_orders",),
    ("asof_last_ship",),
    ("token_count_bpe",),
    ("top_terms",),
    ("doc_sample",),
    ("price_quantiles",),
    ("sessionize",),
    ("region_part_revenue",),
    ("line_repetition",),
    ("pack_windows",),
    ("corpus_filter",),
    ("daily_active_users",),
    ("range_join_ship",),
    ("stratified_split",),
    ("split_stats",),
    ("pii_redact",),
    ("domain_stats",),
    ("length_histogram",),
    ("term_stats",),
    ("source_mixture",),
    ("token_budget",),
    ("decontaminate",),
    ("grouped_percentiles",),
    ("price_deciles",),
    ("lang_pivot",),
    ("event_transitions",),
    ("customer_ltv",),
    ("revenue_cube",),
    ("token_rarity",),
    ("chunk_windows",),
    ("seeded_shuffle",),
    ("snapshot_diff",),
    ("interleave_sources",),
    # link-graph family: oracles read the deterministic pages corpus
    # parquet directly (pinned to the sf0.01 cache dir, which is
    # CONTENT-identical to sf0.001's — both are 500 docs, seed 42)
    ("url_dedup",),
    ("outlinks",),
    ("host_graph",),
    ("host_degree",),
    ("anchor_terms",),
    # round-4 oracle upgrades (rows-only -> hash-checked)
    ("pagerank",),
    ("doc_authority",),
    ("paragraph_dedup",),
    # round-4 new operators
    ("q3_shipping_priority",),
    ("order_percent_rank",),
    ("delta_apply",),
    ("vocab_ids",),
    ("knn_lsh",),
    ("fuzzy_url_pairs",),
    ("value_outliers",),
]


@pytest.mark.parametrize("name", [p[0] for p in PARITY])
def test_parity(ray_session, con, name):
    import __ray_entry__ as ent

    got = ent.queries()[name](SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = con.execute(ent.oracle_sql()[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    assert canon(got) == canon(want)


# attach_dim dispatches broadcast-vs-distributed-join on the dim's
# parquet row count; the sf gate always takes the broadcast path, so
# force cutoff=0 here to pin the JOIN plan to the same oracle.
JOIN_PATH = [
    "mktsegment_orders",
    "nation_revenue",
    "region_part_revenue",
    "top_parts_per_nation",
]


@pytest.mark.parametrize("name", JOIN_PATH)
def test_attach_dim_join_path_matches_oracle(ray_session, con, name):
    import __ray_entry__ as ent
    from deed_ocr_ray.pipelines import relational

    got = getattr(relational, f"q_{name}")(SF, cutoff=0).to_pandas()
    want = con.execute(ent.oracle_sql()[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns)
    assert canon(got) == canon(want)


def test_entry_smoke(ray_session):
    import __ray_entry__ as ent

    ds = ent.entry()
    n = ds.count()
    assert n == 500
    cols = set(ds.schema().names)
    assert {"url", "payload_kind", "status", "n_chars"} <= cols


def test_driver_contract_consistency():
    """Every oracle key must have a query; callables take one sf_dir arg."""
    import inspect

    import __ray_entry__ as ent

    qs, oq = ent.queries(), ent.oracle_sql()
    assert set(oq) <= set(qs), set(oq) - set(qs)
    for name, fn in qs.items():
        params = [p for p in inspect.signature(fn).parameters.values()
                  if p.default is inspect.Parameter.empty]
        assert len(params) == 1, name
