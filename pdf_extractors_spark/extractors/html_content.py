"""HTML main-content extraction (payload family ``html_page``).

The north-rule generalization of the reference's boilerplate line filters
(household.py:95-96 F1, mobil-oil-extractor.py:6-29 F2): strip DOM
boilerplate from embedded HTML using tag + link-density heuristics and
return main content plus labeled field spans.

Heuristics (stdlib-only, no external parser — designed to run vectorized
inside an Arrow batch):

1. drop ``<script>``/``<style>`` bodies entirely,
2. drop container subtrees that are boilerplate by construction:
   ``<nav> <header> <footer> <aside>`` and cookie-banner classes,
3. prefer ``<main>``/``<article>`` subtrees when present,
4. per text block, compute link density = anchor-text chars / total chars;
   keep blocks with density < 0.33 (the line-density heuristic from
   main-content-extraction literature, cf. boilerpipe/jusText), and
5. on plain-text payloads, fall back to the reference's line stop-lists.

Spans: dates (``\\d{2}.\\d{2}.\\d{4}``), amounts (``N,NN NOK``), and
``Key: value`` pairs found in the extracted main text, with offsets into
the extracted text.
"""

from __future__ import annotations

import re

_RE_SCRIPT = re.compile(r"<(script|style)\b[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL)
_RE_DROP_SUBTREE = re.compile(
    r"<(nav|header|footer|aside)\b[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL
)
_RE_COOKIE = re.compile(
    r"<div\b[^>]*class=\"[^\"]*cookie[^\"]*\"[^>]*>.*?</div>", re.IGNORECASE | re.DOTALL
)
_RE_MAIN = re.compile(r"<(main|article)\b[^>]*>(.*?)</\1>", re.IGNORECASE | re.DOTALL)
_RE_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a>", re.IGNORECASE | re.DOTALL)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_BLOCK_SPLIT = re.compile(r"</?(?:p|div|h[1-6]|li|br|tr|td|table)\b[^>]*>", re.IGNORECASE)
_RE_WS = re.compile(r"[ \t]+")

_PLAIN_BOILER = (
    "Cambridge Books",
    "https://",
    "Catalogue of census declarations",
    "©",
)

_SPAN_PATTERNS = {
    "date": re.compile(r"\b\d{2}\.\d{2}\.\d{4}\b"),
    "amount_nok": re.compile(r"\b\d{1,3}(?:\s?\d{3})*,\d{2} NOK\b"),
    "amount_usd": re.compile(r"\$\d{1,3}(?:,\d{3})*(?:\.\d{2})?"),
    "key_value": re.compile(r"^[A-Z][\w ./]{2,30}:\s+\S.*$", re.MULTILINE),
}

MAX_LINK_DENSITY = 0.33
MIN_BLOCK_CHARS = 20


def _link_density(html_block: str) -> float:
    total = len(_RE_TAG.sub("", html_block).strip())
    if total == 0:
        return 1.0
    anchor = sum(len(_RE_TAG.sub("", m).strip()) for m in _RE_ANCHOR.findall(html_block))
    return anchor / total


def _clean_text(html_block: str) -> str:
    text = _RE_TAG.sub(" ", html_block)
    text = (
        text.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", '"').replace("&#39;", "'").replace("&nbsp;", " ")
    )
    # one whitespace-collapse pass over the whole block, then strip per
    # line: identical output to a per-line sub ([ \t]+ never crosses a
    # newline) at a fraction of the regex-call overhead
    lines = [ln.strip() for ln in _RE_WS.sub(" ", text).split("\n")]
    return "\n".join(ln for ln in lines if ln)


def _extract_html(payload: str) -> str:
    cleaned = _RE_SCRIPT.sub(" ", payload)
    cleaned = _RE_COOKIE.sub(" ", cleaned)
    cleaned = _RE_DROP_SUBTREE.sub(" ", cleaned)
    main = _RE_MAIN.search(cleaned)
    scope = main.group(2) if main else cleaned
    blocks = _RE_BLOCK_SPLIT.split(scope)
    kept: list[str] = []
    for block in blocks:
        # tag-separator fragments are whitespace-only; _clean_text would
        # return '' for them anyway (exact guard, ~half the blocks)
        if not block.strip():
            continue
        text = _clean_text(block)
        if not text:
            continue
        if len(text) < MIN_BLOCK_CHARS and not main:
            continue
        # cheap guard: no anchor tag → anchor chars 0 → density 0 < max
        # (total > 0 whenever the cleaned text is non-empty, so the
        # division branch cannot return 1.0 here)
        if ("<a" in block or "<A" in block) and _link_density(block) >= MAX_LINK_DENSITY:
            continue
        kept.append(text)
    return "\n".join(kept)


def _extract_plain(payload: str) -> str:
    kept = [
        ln
        for ln in payload.split("\n")
        if ln.strip() and not ln.strip().startswith(_PLAIN_BOILER)
    ]
    return "\n".join(kept)


# exact cheap guards: each pattern cannot match without its literal
_SPAN_GUARDS = {"amount_nok": "NOK", "amount_usd": "$", "key_value": ":"}


def find_spans(text: str) -> list[dict]:
    spans = []
    for label, pat in _SPAN_PATTERNS.items():
        guard = _SPAN_GUARDS.get(label)
        if guard is not None and guard not in text:
            continue
        for m in pat.finditer(text):
            spans.append(
                {"label": label, "start": m.start(), "end": m.end(), "value": m.group(0)}
            )
    spans.sort(key=lambda s: (s["start"], s["label"]))
    return spans


def extract(payload: str) -> dict:
    is_html = "<html" in payload[:200].lower() or "<body" in payload[:500].lower()
    text = _extract_html(payload) if is_html else _extract_plain(payload)
    return {
        "extracted_text": text,
        "spans": find_spans(text),
        "records": [],
        "parse_errors": 0,
    }
