"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine top-k as the exact baseline and a label-partitioned
(IVF-style) variant as the scale path. Shuffle-conscious shape:

* the query matrix is tiny and is broadcast to every batch task (at
  cluster scale: ``ray.put`` once, ``ray.get`` in actor ``__init__``);
* each batch computes cosines vectorized (numpy float64 matmul) and
  emits only its LOCAL top-k per query — the global shuffle then moves
  ``k × n_queries`` rows per batch, not the full corpus;
* final exact top-k per query via ``groupby(query_id).map_groups``.

All cosine math is float64 end-to-end, which is bit-identical to
DuckDB's ``list_cosine_similarity`` on ``DOUBLE[]`` — so the oracle
matches exactly (verified: identical doubles).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

K_NEIGHBORS = 10
N_QUERIES = 5


def _load_queries(sf_dir: str, n: int = N_QUERIES) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """First ``n`` vectors by vec_id as the query set (deterministic)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"])
    idx = pa.compute.sort_indices(t, sort_keys=[("vec_id", "ascending")])
    t = t.take(idx[:n])
    q = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    qid = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    qlab = np.array(t.column("label").to_pylist(), dtype=np.int64)
    return q, qid, qlab


def _cosine_block(q: np.ndarray, m: np.ndarray) -> np.ndarray:
    """cos(q_i, m_j) in float64, bit-matching DuckDB's
    ``list_cosine_similarity`` on DOUBLE[]: sequential accumulation
    (cumsum order, not BLAS pairwise) and ``dot/(sqrt(na)*sqrt(nb))``.
    Verified element-exact against DuckDB on every non-self pair."""
    prod = q[:, None, :] * m[None, :, :]
    dots = np.cumsum(prod, axis=2)[:, :, -1]
    qn = np.sqrt(np.cumsum(q * q, axis=1)[:, -1])
    mn = np.sqrt(np.cumsum(m * m, axis=1)[:, -1])
    return dots / (qn[:, None] * mn[None, :])


class TopKScorer:
    """Actor: per-batch cosine vs the broadcast query matrix, local top-k."""

    def __init__(self, queries: np.ndarray, query_ids: np.ndarray, k: int,
                 exclude_self: bool = True) -> None:
        self.q = queries
        self.qid = query_ids
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, t: pa.Table) -> pa.Table:
        vec_ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        cos = _cosine_block(self.q, m)
        out_q: List[int] = []
        out_n: List[int] = []
        out_c: List[float] = []
        k = min(self.k, m.shape[0])
        for i, qid in enumerate(self.qid):
            row = cos[i]
            mask = vec_ids != qid if self.exclude_self else np.ones_like(vec_ids, bool)
            cand = np.where(mask)[0]
            if len(cand) == 0:
                continue
            # deterministic: sort by (-cos, vec_id)
            order = cand[np.lexsort((vec_ids[cand], -row[cand]))][:k]
            out_q.extend([int(qid)] * len(order))
            out_n.extend(int(v) for v in vec_ids[order])
            out_c.extend(float(c) for c in row[order])
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "cos": pa.array(out_c, type=pa.float64()),
        })


def _global_topk(g: pd.DataFrame, k: int = K_NEIGHBORS) -> pd.DataFrame:
    g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
    return g.reset_index(drop=True)


def q_knn_cosine(sf_dir: str) -> "ray.data.Dataset":
    """Exact brute-force cosine top-10 for the first 5 vec_ids.
    Columns: query_id, neighbor_id, cos."""
    q, qid, _ = _load_queries(sf_dir)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    local = ds.map_batches(
        TopKScorer,
        fn_constructor_kwargs={"queries": q, "query_ids": qid, "k": K_NEIGHBORS},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return local.groupby("query_id").map_groups(_global_topk, batch_format="pandas")


Q_KNN_SQL = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES}
),
scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS cos
    FROM q, embeddings e
    WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id ASC) AS rn
    FROM scored
) WHERE rn <= {K_NEIGHBORS}
"""


def q_knn_ivf(sf_dir: str) -> "ray.data.Dataset":
    """IVF-style pruned k-NN: probe only the query's own ``label``
    partition (the coarse quantizer stand-in). At scale this is the
    shuffle-free path: partitions are read selectively instead of
    scanning the corpus. Columns: query_id, neighbor_id, cos."""
    q, qid, qlab = _load_queries(sf_dir)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])

    class IvfScorer(TopKScorer):
        def __init__(self) -> None:
            super().__init__(q, qid, K_NEIGHBORS)
            self.qlab = qlab

        def __call__(self, t: pa.Table) -> pa.Table:
            labels = np.asarray(t["label"].to_pylist(), dtype=np.int64)
            vec_ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
            m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
            out_q, out_n, out_c = [], [], []
            for i, (qid_i, ql) in enumerate(zip(self.qid, self.qlab)):
                sel = np.where((labels == ql) & (vec_ids != qid_i))[0]
                if len(sel) == 0:
                    continue
                row = _cosine_block(self.q[i : i + 1], m[sel])[0]
                order = np.lexsort((vec_ids[sel], -row))[: self.k]
                out_q.extend([int(qid_i)] * len(order))
                out_n.extend(int(v) for v in vec_ids[sel][order])
                out_c.extend(float(c) for c in row[order])
            return pa.table({
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cos": pa.array(out_c, type=pa.float64()),
            })

    local = ds.map_batches(IvfScorer, batch_format="pyarrow", concurrency=(1, 8))
    return local.groupby("query_id").map_groups(_global_topk, batch_format="pandas")


Q_KNN_IVF_SQL = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label
    FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES}
),
scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS cos
    FROM q JOIN embeddings e ON e.label = q.label
    WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id ASC) AS rn
    FROM scored
) WHERE rn <= {K_NEIGHBORS}
"""


def q_embedding_neardup(sf_dir: str, min_cos: float = 0.90) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate detection, label-blocked (pairs
    are only searched within a label partition — the LSH-bucket analogue
    for dense vectors). Emits every within-label pair with
    cos >= ``min_cos`` PLUS each label's single closest pair (so the
    result is never empty and the operator's output schema is stable).
    Columns: label, vec_a, vec_b, cos, is_above_threshold.
    (No SQL oracle: blocked heuristic recall.)"""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        label = int(g["label"].iloc[0])
        ids = np.asarray(g["vec_id"], dtype=np.int64)
        m = np.array(list(g["embedding"]), dtype=np.float64)
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        if len(ids) < 2:
            return pd.DataFrame({
                "label": pd.Series([], dtype="int64"),
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
                "is_above_threshold": pd.Series([], dtype="bool"),
            })
        cos = _cosine_block(m, m)
        ii, jj = np.triu_indices(len(ids), k=1)
        vals = cos[ii, jj]
        keep = vals >= min_cos
        best = int(np.argmax(vals))
        keep[best] = True  # closest pair always reported
        return pd.DataFrame({
            "label": np.full(int(keep.sum()), label, dtype=np.int64),
            "vec_a": ids[ii[keep]],
            "vec_b": ids[jj[keep]],
            "cos": vals[keep],
            "is_above_threshold": vals[keep] >= min_cos,
        })

    return ds.groupby("label").map_groups(pairs, batch_format="pandas")
