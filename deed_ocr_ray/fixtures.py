"""Deterministic synthetic `pages` corpus generator — FIXTURES.md contract.

One seeded ``random.Random`` per row (string-seeded: platform-stable),
no wall-clock, no ``hash()``; row classes assigned by ``doc_id % 100``
ranges so proportions are exact. The corpus is the engine-specific
analogue of the reference's golden inputs (test/1460797.pdf,
test/3917312-1.pdf) plus its synthetic deed-text fixture
(test/test_gemini_ocr.py:14-64).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from typing import Any, Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

from .functions.pdfgen import make_pdf, truncate_pdf
from .schema import PAGES_SCHEMA
from .functions.stopwords import STOPWORDS

EPOCH = datetime(2024, 1, 1)

# Frozen sf_test corpus parameters — the golden files in tests/golden/
# are generated from exactly these (FIXTURES.md "sf_test").
SF_TEST = {"n_rows": 300, "seed": 42, "giant_bytes": 65536, "n_shards": 6}

# class name -> [lo, hi) of doc_id % 100  (FIXTURES.md proportions)
CLASS_RANGES = [
    ("html_clean", 0, 40),
    ("html_messy", 40, 55),
    ("html_boiler_heavy", 55, 65),
    ("html_watermarked", 65, 70),
    ("pdf_min", 70, 80),
    ("pdf_truncated", 80, 83),
    ("text_only", 83, 90),
    ("empty", 90, 93),
    ("giant", 93, 95),
    ("binary_junk", 95, 100),
]

LANGS = ("en", "de", "id", "unknown")

_CONTENT_WORDS = (
    "data table query batch stream shard block record column schema engine "
    "pipeline worker cluster index vector window merge filter scan count "
    "parcel county deed grantor grantee survey boundary corner marker title "
    "estate acre tract plat recorder township courthouse witness seal "
    "notary covenant easement parcel frontage meridian monument bearing"
).split()

_STOP_LISTS = {lang: sorted(STOPWORDS.get(lang, STOPWORDS["en"])) for lang in LANGS}


def _sentence(rng: random.Random, stop: Sequence[str], n: Optional[int] = None) -> str:
    n = n or rng.randint(8, 18)
    words = [
        rng.choice(stop) if rng.random() < 0.45 else rng.choice(_CONTENT_WORDS)
        for _ in range(n)
    ]
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."

def _paragraph(rng: random.Random, stop: Sequence[str], n_sent: Optional[int] = None) -> str:
    return " ".join(_sentence(rng, stop) for _ in range(n_sent or rng.randint(2, 5)))

def _trs_text(rng: random.Random) -> str:
    q = rng.choice(["NE", "NW", "SE", "SW"])
    return (
        f"The {q} 1/4 of Section {rng.randint(1, 36)}, "
        f"Township {rng.randint(1, 20)} North, Range {rng.randint(1, 20)} West"
    )

def _lot_block_text(rng: random.Random) -> str:
    name = rng.choice(["RIVERSIDE ESTATES", "OAKWOOD ADDITION", "HILLTOP SUBDIVISION"])
    return f"Lot {rng.randint(1, 99)}, Block {rng.randint(1, 20)}, {name}"

def _metes_text(rng: random.Random) -> str:
    return (
        f"Beginning at a point on the North line of the parcel, "
        f"thence South {rng.randint(50, 500)} feet"
    )

def _deed_sentences(rng: random.Random) -> List[str]:
    out = [f"{_trs_text(rng)}.", f"{_lot_block_text(rng)}.", f"{_metes_text(rng)}."]
    if rng.random() < 0.7:
        out.append("Grantor is reserving all oil, gas and other minerals.")
    return out


# ------------------------------------------------------------- html builders

def _link_host(w: str) -> str:
    """Deterministic cross-host link target for an anchor word: maps into
    the same 37-host universe as :func:`_url`, so the synthetic corpus
    carries a real host-level link graph (hosts that have pages also
    receive links). Pure function of the word — adds NO rng draws, so
    document text (and the frozen extraction goldens) stay byte-identical
    to the relative-href corpus."""
    import zlib

    return f"site{zlib.crc32(w.encode()) % 37:03d}.example"


def _nav(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="https://{_link_host(w)}/{w}">{w.capitalize()}</a></li>'
        for w in rng.sample(_CONTENT_WORDS, rng.randint(4, 8))
    )
    return f"<nav><ul>{items}</ul></nav>"

def _linkfarm(rng: random.Random) -> str:
    links = " | ".join(
        f'<a href="//{_link_host(w)}/t/{w}">{w}</a>'
        for w in rng.sample(_CONTENT_WORDS, rng.randint(8, 14))
    )
    return f'<div class="links">{links}</div>'

def _footer(rng: random.Random) -> str:
    return (
        '<footer><p>Copyright 2024 Example Site. <a href="/terms">Terms</a> '
        '<a href="/privacy">Privacy</a></p></footer>'
    )

def _html_doc(rng: random.Random, lang: str, n_paras: int, inject_deed: bool,
              watermarked: bool = False) -> str:
    stop = _STOP_LISTS[lang]
    title = " ".join(rng.choice(_CONTENT_WORDS).capitalize() for _ in range(3))
    paras = []
    for i in range(n_paras):
        p = _paragraph(rng, stop)
        if inject_deed and i == n_paras // 2:
            p = p + " " + " ".join(_deed_sentences(rng))
        if watermarked:
            words = p.split(" ")
            k = rng.randint(1, max(1, len(words) - 1))
            words.insert(k, "UNOFFICIAL COPY")
            p = " ".join(words)
            p = p.replace(" ", "   ", 1)       # multi-space run
            p = p.replace(". ", ".\n\n\n", 1)  # triple-newline run
        paras.append(f"<p>{p}</p>")
    body = "\n".join(paras)
    return (
        "<!DOCTYPE html><html><head>"
        f'<meta charset="utf-8"><title>{title}</title>'
        '<script>var x = "<p>not content</p>";</script>'
        "<style>p { color: black }</style></head><body>\n"
        f"{_nav(rng)}\n<header><h1>{title}</h1></header>\n"
        f"<main>\n{body}\n</main>\n{_linkfarm(rng)}\n{_footer(rng)}\n"
        "</body></html>"
    )

def _messy_html(rng: random.Random, lang: str) -> str:
    doc = _html_doc(rng, lang, rng.randint(2, 5), inject_deed=rng.random() < 0.3)
    doc = doc.replace("</p>", "", 1)                      # unclosed <p>
    doc = doc.replace("<main>", "<main></div></div>", 1)  # stray closers
    doc = doc.replace(
        '<meta charset="utf-8">', '<meta charset="iso-8859-1">', 1
    )  # declared/actual mismatch
    entity_soup = "<p>&amp; &nbsp; &#72;&#105; &lt;tag&gt; &quot;quoted&quot; &unknown;</p>"
    doc = doc.replace("</main>", entity_soup + "</main>", 1)
    return doc + "<!-- unterminated trailing comment "

def _boiler_heavy_html(rng: random.Random, lang: str) -> str:
    stop = _STOP_LISTS[lang]
    one_real = _paragraph(rng, stop, 2)
    side = "".join(
        f'<li><a href="/{w}">{w} {rng.choice(stop)}</a></li>'
        for w in rng.sample(_CONTENT_WORDS, 12)
    )
    return (
        "<html><head><title>boiler</title></head><body>"
        f"{_nav(rng)}{_nav(rng)}<aside><ul>{side}</ul></aside>"
        f"<main><p>{one_real}</p></main>"
        f"{_linkfarm(rng)}{_linkfarm(rng)}{_footer(rng)}</body></html>"
    )

def _giant_html(rng: random.Random, lang: str, target_bytes: int) -> str:
    stop = _STOP_LISTS[lang]
    paras = []
    size = 0
    while size < target_bytes:
        p = f"<p>{_paragraph(rng, stop, 6)}</p>"
        paras.append(p)
        size += len(p)
    return (
        "<html><head><title>giant</title></head><body>"
        f"{_nav(rng)}<main>{''.join(paras)}</main>{_footer(rng)}</body></html>"
    )

def _deed_text(rng: random.Random) -> str:
    parties = (
        f"THIS INDENTURE, made between {rng.choice(['John','Mary','Alice','Robert'])} "
        f"{rng.choice(['Smith','Jones','Garcia','Chen'])} (Grantor) and "
        f"{rng.choice(['Pat','Sam','Lee','Kim'])} {rng.choice(['Brown','White','Davis'])} (Grantee)."
    )
    lines = [
        parties,
        "",
        "LEGAL DESCRIPTION:",
        _metes_text(rng) + f", thence West {rng.randint(50, 300)} feet, "
        f"containing {rng.randint(1, 40)} acres.",
        _trs_text(rng) + ".",
        _lot_block_text(rng) + ".",
        "",
        "",
        "Subject to existing easements.  Grantor is reserving all oil, gas and minerals.",
    ]
    return "\n".join(lines)


# ------------------------------------------------------------------- rows

def class_of(doc_id: int) -> str:
    r = doc_id % 100
    for name, lo, hi in CLASS_RANGES:
        if lo <= r < hi:
            return name
    raise AssertionError(r)


def _url(doc_id: int, cls: str) -> str:
    return f"https://site{doc_id % 37:03d}.example/{cls}/{doc_id:06d}"


def gen_row(seed: int, doc_id: int, giant_bytes: int = 262144) -> Dict[str, Any]:
    rng = random.Random(f"{seed}:{doc_id}")
    cls = class_of(doc_id)
    lang = LANGS[doc_id % 4]
    html: Optional[bytes] = b""
    text = ""
    if cls == "html_clean":
        html = _html_doc(rng, lang, rng.randint(3, 7), inject_deed=rng.random() < 0.25).encode()
    elif cls == "html_messy":
        html = _messy_html(rng, lang).encode()
    elif cls == "html_boiler_heavy":
        html = _boiler_heavy_html(rng, lang).encode()
    elif cls == "html_watermarked":
        html = _html_doc(rng, lang, rng.randint(3, 6), inject_deed=False, watermarked=True).encode()
    elif cls == "pdf_min":
        n_pages = rng.randint(1, 7)
        pages = []
        for p in range(n_pages):
            lines = [_sentence(rng, _STOP_LISTS[lang]) for _ in range(rng.randint(4, 9))]
            if p == 0 and rng.random() < 0.5:
                lines.extend(_deed_sentences(rng))
            pages.append(lines)
        html = make_pdf(pages, compress=rng.random() < 0.5)
    elif cls == "pdf_truncated":
        pdf = make_pdf([[_sentence(rng, _STOP_LISTS[lang])] for _ in range(3)])
        html = truncate_pdf(pdf)
    elif cls == "text_only":
        html = None
        text = _deed_text(rng)
    elif cls == "empty":
        html = b""
        text = ""
    elif cls == "giant":
        html = _giant_html(rng, lang, giant_bytes).encode()
    elif cls == "binary_junk":
        size = rng.randint(512, 4096)
        junk = bytes(rng.getrandbits(8) for _ in range(size))
        if junk[:4] == b"%PDF":  # never accidentally a PDF
            junk = b"\x00" + junk[1:]
        html = junk
    # designated duplicate groups: doc_id % 97 == 0 shares the previous
    # doc's url (differing warc_ts) for the url-dedup operators.
    if doc_id > 0 and doc_id % 97 == 0:
        url = _url(doc_id - 1, class_of(doc_id - 1))
    else:
        url = _url(doc_id, cls)
    return {
        "url": url,
        "warc_ts": EPOCH + timedelta(seconds=137 * doc_id),
        "html": html,
        "text": text,
        "lang": lang,
    }


def build_pages_table(seed: int, doc_ids: Sequence[int], giant_bytes: int = 262144) -> pa.Table:
    rows = [gen_row(seed, d, giant_bytes) for d in doc_ids]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def write_pages_corpus(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    n_shards: int = 4,
    giant_bytes: int = 262144,
    use_ray: bool = False,
) -> List[str]:
    """Write the corpus as ``n_shards`` parquet files of contiguous
    ``doc_id`` ranges. With ``use_ray``, shards are generated by parallel
    Ray tasks (content per row depends only on ``(seed, doc_id)``, so
    sharding never changes bytes)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    bounds = [round(i * n_rows / n_shards) for i in range(n_shards + 1)]
    paths = [os.path.join(out_dir, f"shard_{i:04d}.parquet") for i in range(n_shards)]

    def _write(i: int) -> str:
        tbl = build_pages_table(seed, range(bounds[i], bounds[i + 1]), giant_bytes)
        pq.write_table(tbl, paths[i])
        return paths[i]

    if use_ray:
        import ray

        @ray.remote
        def _w(i: int) -> str:
            return _write(i)

        ray.get([_w.remote(i) for i in range(n_shards)])
    else:
        for i in range(n_shards):
            _write(i)
    return paths
