"""Ensemble-consensus machinery (vision_llm.py:181-217 semantics)."""

import pyarrow as pa

from deed_ocr_ray.pipelines.ensemble import DEFAULT_PROVIDERS, EnsembleScorer


def _batch(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })


def test_first_max_wins_ties():
    # two providers tie at 0.5 -> the FIRST one wins (reference max())
    provs = [
        ("a", lambda t: ("A", 0.5)),
        ("b", lambda t: ("B", 0.5)),
        ("c", lambda t: ("C", 0.4)),
    ]
    out = EnsembleScorer(provs)(_batch(["x"]))
    assert out["winner"][0].as_py() == "a"
    assert out["extracted"][0].as_py() == "A"
    assert out["status"][0].as_py() == "ok"


def test_provider_failure_absorbed():
    def boom(t):
        raise RuntimeError("provider down")

    provs = [("dead", boom), ("live", lambda t: ("L", 0.3))]
    out = EnsembleScorer(provs)(_batch(["x"]))
    assert out["winner"][0].as_py() == "live"
    assert out["status"][0].as_py() == "ok"


def test_all_providers_failed_is_error_row():
    def boom(t):
        raise RuntimeError("down")

    out = EnsembleScorer([("d1", boom), ("d2", boom)])(_batch(["x", "y"]))
    assert out["status"].to_pylist() == ["error", "error"]
    assert out["confidence"].to_pylist() == [0.0, 0.0]
    assert out["winner"].to_pylist() == ["", ""]


def test_default_provider_semantics():
    long = "reserve " + "w" * 200
    short = "tiny"
    out = EnsembleScorer()(_batch([long, short]))
    # keyword (0.8) beats head (0.6) on the long reserve doc
    assert out["winner"][0].as_py() == "keyword"
    assert out["extracted"][0].as_py() == long[:120]
    # short doc: head=0.3, keyword=0.2, tail=0.5 -> tail
    assert out["winner"][1].as_py() == "tail"
    assert out["extracted"][1].as_py() == short[-80:]
    assert [p[0] for p in DEFAULT_PROVIDERS] == ["head", "keyword", "tail"]
