"""FFIEC coordinate-table extraction (payload family ``coord_table``).

Re-expresses ``us-ffiec-demographic-Info/ffiec-census.py``:

* layout scan S5 — span records with x/y coordinates and font metadata
  (ffiec-census.py:31-44); payloads serialize one span per line as
  ``x0|y0|font|text``, blocks separated by blank lines,
* header capture — first block's cells become the schema, keyed by their
  x-coordinates (ffiec-census.py:61-73), with ``\\n``→space normalization,
* font predicate F5 — only ``Arial`` spans are data (ffiec-census.py:40-44),
* coordinate→column assignment M4 — a span belongs to the last header
  column whose x ≤ span.x (ffiec-census.py:50-58), an interval lookup via
  ``bisect`` over the sorted header x-coordinates (headers are a handful
  of columns: stdlib bisect beats ``numpy.searchsorted`` here because the
  per-call numpy dispatch overhead dominates at this array size —
  measured ~25% of the family's kernel time),
* row-validity predicate F6 — emit only when ``County Code`` is non-null
  (ffiec-census.py:45-46).
"""

from __future__ import annotations

import bisect


def _parse_span(line: str) -> tuple[float, float, str, str] | None:
    parts = line.split("|", 3)
    if len(parts) != 4:
        return None
    try:
        return float(parts[0]), float(parts[1]), parts[2], parts[3]
    except ValueError:
        return None


def extract(payload: str) -> dict:
    blocks: list[list[tuple[float, float, str, str]]] = []
    current: list[tuple[float, float, str, str]] = []
    errors = 0
    for line in payload.split("\n"):
        if line == "":
            if current:
                blocks.append(current)
                current = []
            continue
        span = _parse_span(line)
        if span is None:
            errors += 1
            continue
        current.append(span)
    if current:
        blocks.append(current)
    if not blocks:
        return {"extracted_text": "", "spans": [], "records": [], "parse_errors": errors}

    # header block → (x, name), normalized (ffiec-census.py:69-73)
    header = [(x, text.replace("\n", " ")) for x, _y, _f, text in blocks[0] if text != ""]
    header.sort(key=lambda t: t[0])
    xs = [x for x, _ in header]
    names = [n for _, n in header]

    records: list[dict] = []
    kept_lines: list[str] = []
    for block in blocks[1:]:
        row: dict = {name: None for name in names}
        got = False
        for x, _y, font, text in block:
            if font != "Arial":  # F5
                continue
            # M4: last header x ≤ span x (interval lookup). A span LEFT of
            # the first header column lands under the reference's phantom
            # '' key (ffiec-census.py:50-58 returns the initial
            # previous_column_value), NOT the first real column —
            # bug-for-bug, so it can never flip the County-Code gate.
            idx = bisect.bisect_right(xs, x) - 1
            name = names[idx] if idx >= 0 else ""
            row[name] = text
            kept_lines.append(text)
            got = True
        if got and row.get("County Code"):  # F6
            records.append(row)
    return {
        "extracted_text": "\n".join(kept_lines),
        "spans": [],
        "records": records,
        "parse_errors": errors,
    }
