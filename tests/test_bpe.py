"""BPE training/encoding exactness + the distributed pipeline wiring."""

import numpy as np
import pytest

from deed_ocr_ray.pipelines.bpe import (
    END, bpe_encode_word, bpe_fit, bpe_train_on_counts,
)

SF = "/root/testdata/sf0.001"


def test_bpe_train_textbook_example():
    """The Sennrich-paper style example: merges follow pair frequency
    with lexicographic tie-break, deterministic order."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train_on_counts(counts, 4)
    # 'es' (9) then 'est' (9) then 'est</w>' (9) dominate, then 'lo' (7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")
    again = bpe_train_on_counts(counts, 4)
    assert merges == again  # deterministic


def test_bpe_train_stops_when_no_repeating_pair():
    merges = bpe_train_on_counts([("ab", 1), ("cd", 1)], 10)
    assert merges == []  # every pair occurs once: nothing to merge


def test_bpe_encode_applies_merges_by_rank():
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    ranks = {m: i for i, m in enumerate(bpe_train_on_counts(counts, 10))}
    toks = bpe_encode_word("newest", ranks)
    assert "".join(toks) == "newest" + END  # lossless
    assert len(toks) < len("newest") + 1   # actually compressed
    assert bpe_encode_word("newest", ranks) == toks  # deterministic
    # unseen word: falls back toward characters, still lossless
    assert "".join(bpe_encode_word("zq", ranks)) == "zq" + END


def test_bpe_fit_distributed_matches_local_train(ray_session):
    """Distributed word-count -> driver merge loop must equal training
    directly on a local exact word count of the same corpus."""
    import collections

    import duckdb

    from deed_ocr_ray.pipelines.bpe import BPE_MAX_WORDS, BPE_MERGES

    texts = [r[0] for r in duckdb.sql(
        f"select text from read_parquet('{SF}/documents.parquet')").fetchall()]
    c = collections.Counter()
    for x in texts:
        c.update(x.split())
    head = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_MAX_WORDS]
    want = bpe_train_on_counts(head, BPE_MERGES)
    got = bpe_fit(SF)
    assert got == want


def test_bpe_pipeline_queries(ray_session):
    from deed_ocr_ray.pipelines.bpe import q_bpe_merges, q_bpe_tokenize

    merges = q_bpe_merges(SF).to_pandas()
    assert list(merges.columns) == ["rank", "left", "right"]
    assert list(merges["rank"]) == list(range(len(merges)))
    assert len(merges) > 50  # real corpus: plenty of repeating pairs

    df = q_bpe_tokenize(SF).to_pandas().sort_values("doc_id")
    assert len(df) == 500
    assert (df["n_bpe_tokens"] > 0).all()
    # BPE tokens per doc: at least one per word, at most chars+words
    import duckdb
    base = duckdb.sql(f"""
        select doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) as n_words,
               length(text) as n_chars
        from read_parquet('{SF}/documents.parquet') order by doc_id
    """).fetchdf()
    assert (df["n_bpe_tokens"].to_numpy() >= base["n_words"].to_numpy()).all()
    assert (df["n_bpe_tokens"].to_numpy()
            <= base["n_chars"].to_numpy() + base["n_words"].to_numpy()).all()
