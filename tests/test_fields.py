"""Regex field extraction truth table (FIXTURES.md table 3) + scoring/dedup."""

import pytest

from deed_ocr_ray.functions.regex_fields import (
    confidence,
    extract_field_spans,
    suppress_near_dups,
    text_similarity,
)

CASES = [
    ("Beginning at a point on the north line, thence south 100 feet", "metes_bounds", True),
    ("Lot 42, Block B, RIVERSIDE ESTATES", "lot_block", True),
    ("The SW 1/4 of Section 15, Township 2 North, Range 3 East", "trs", True),
    ("Section 7, Township 10 N, Range 4 W", "trs", True),
    ("Just some plain prose about nothing in particular.", None, False),
    ("We began at the store and walked.", "metes_bounds", False),
]


@pytest.mark.parametrize("text,kind,found", CASES)
def test_pattern_truth_table(text, kind, found):
    spans = extract_field_spans(text)
    kinds = {k for k, _, _, _ in spans}
    if found:
        assert kind in kinds
    elif kind is not None:
        assert kind not in kinds
    else:
        assert not kinds


def test_spans_index_into_text():
    text = "LEGAL DESCRIPTION: Lot 1, Block 2, OAKWOOD ADDITION and more."
    spans = extract_field_spans(text)
    assert spans
    for _, s, e, _ in spans:
        assert text[s:e]


def test_confidence_semantics():
    # base 0.5; +0.2 within 500 chars of a header (symmetric window,
    # llm.py:152-157); +0.1 len>100; +0.1 len>200; cap 0.9
    assert confidence(10, 50, []) == 0.5
    assert confidence(10, 50, [0]) == 0.7
    assert confidence(10, 120, []) == 0.6
    assert confidence(10, 250, []) == 0.7
    assert confidence(10, 250, [0]) == 0.9
    assert confidence(700, 999, [0]) == pytest.approx(0.7)  # header too far
    assert confidence(0, 50, [300]) == 0.7   # match BEFORE header boosts too
    assert confidence(0, 50, [499]) == 0.7   # strict < 500
    assert confidence(0, 50, [500]) == 0.5


def test_similarity_semantics():
    assert text_similarity("abc", "abc") == 1.0
    assert text_similarity("abc", "ABC ") == 1.0  # lowercase+strip first (llm.py:195-217)
    assert text_similarity("abc", "xx abc yy") == 0.9
    assert text_similarity("ABC", "xx abc yy") == 0.9  # case-folded containment
    assert text_similarity("a b c", "a b d") == 0.5  # jaccard 2/4
    assert text_similarity("", "x") == 0.9  # "" in "x" (containment, reference quirk)


def test_near_dup_suppression():
    cands = [("Lot 1 Block 2 OAKWOOD", 0.5), ("Lot 1 Block 2 OAKWOOD extra", 0.7), ("other thing", 0.6)]
    kept = suppress_near_dups(cands)
    texts = [t for t, _ in kept]
    assert "Lot 1 Block 2 OAKWOOD extra" in texts  # highest score survives
    assert "Lot 1 Block 2 OAKWOOD" not in texts    # contained -> 0.9 sim -> suppressed
    assert "other thing" in texts
