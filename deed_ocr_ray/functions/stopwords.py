"""Language-gated stop-word tables for the block classifier.

Analogue of the reference's keyword gates (deed_ocr/models/layout.py:105,125
keyword containment; the language gate itself is new, keyed on the input
``lang`` column per BASELINE.json). Small built-in function-word lists —
enough for a jusText/Boilerpipe-style stop-word-density signal; unknown
languages fall back to English (the jusText convention).

Lists are frozen constants: byte-identical classification depends on them.
"""

from __future__ import annotations

from typing import Dict, FrozenSet

_EN = """a about above after again all am an and any are as at be because been
before being below between both but by could did do does doing down during
each few for from further had has have having he her here hers him his how i
if in into is it its just me more most my no nor not of off on once only or
other our out over own same she so some such than that the their them then
there these they this those through to too under until up very was we were
what when where which while who whom why will with you your"""

_DE = """aber alle als also am an auch auf aus bei bin bis da damit dann das
dass dem den der des die diese doch dort du durch ein eine einem einen einer
es für hab habe haben hat hatte hier ich ihr im in ist ja kann kein können
mal man mehr mein mit muss nach nicht noch nun nur ob oder schon sein seine
sich sie sind so über um und uns unter vom von vor war waren was wenn werden
wie wieder wir wird wo zu zum zur"""

_ES = """a al algo como con de del desde donde el ella ellos en entre era es
esta estas este esto estos fue ha hay la las le lo los más mi muy no nos o
para pero por que se sin sobre son su sus también te tiene todo un una uno y
ya"""

_FR = """à au aux avec ce ces dans de des du elle en est et été être il ils je
la le les leur lui mais me même mes moi mon ne nos notre nous on ou où par
pas plus pour qui que sa se ses son sur ta te tes toi ton tout tu un une vos
votre vous y"""

_ID = """ada adalah akan antara atau bagi bahwa belum bisa dalam dan dari
dengan di dia harus ini itu jika juga kami kamu karena ke kepada kita lain
lebih mereka oleh pada para saat saya sebagai sudah tapi telah tentang tidak
untuk yang"""

_ZH = """的 了 是 在 我 有 和 就 不 人 都 一 也 这 中 大 为 上 个 国 到 说 们
你 他 她 着 那 要 会 对 与 之 于 及 或 被 从 但 并 等 把 向"""


def _mk(s: str) -> FrozenSet[str]:
    return frozenset(s.split())


STOPWORDS: Dict[str, FrozenSet[str]] = {
    "en": _mk(_EN),
    "de": _mk(_DE),
    "es": _mk(_ES),
    "fr": _mk(_FR),
    "id": _mk(_ID),
    "zh": _mk(_ZH),
}

DEFAULT_LANG = "en"


def stopwords_for(lang: str) -> FrozenSet[str]:
    """Stop-word set for ``lang`` (2-letter code or anything); unknown
    languages (incl. the fixture's literal ``"unknown"``) gate to English."""
    if not lang:
        return STOPWORDS[DEFAULT_LANG]
    return STOPWORDS.get(lang.lower()[:2], STOPWORDS[DEFAULT_LANG])


def stopword_ratio(words, stop: FrozenSet[str]) -> float:
    """Fraction of words (already lowercased) that are stop words."""
    if not words:
        return 0.0
    return sum(map(stop.__contains__, words)) / len(words)
