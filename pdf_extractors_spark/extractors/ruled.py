"""Ruled/grid table extraction (payload family ``ruled_table``).

Re-expresses the isobic + knr table scans:

* lattice table scan S3/S6 — payloads carry delimiter-ruled rows
  (``cell1│cell2│...``), header row first (isobic_pdf_to_csv.py:67-68,
  knr_property.py:29-35),
* whitespace normalization X1 — ``[\\r\\n\\t]``→space on header names and
  all cells (isobic_pdf_to_csv.py:70-71),
* header-row skip F10 (knr_property.py:38-40),
* row repair M5 — a merged ``Total X Y`` first cell is re-split into
  columns 0, 5 and 6 (knr_property.py:50-55),
* all-string parsing (isobic_pdf_to_csv.py:67 ``dtype=str``).
"""

from __future__ import annotations

import re

_WS = re.compile(r"[\r\n\t]")
_DELIM = "│"


def normalize_ws(s: str) -> str:
    """X1 (isobic_pdf_to_csv.py:70-71)."""
    return _WS.sub(" ", s)


def enrich_row(cells: list[str]) -> list[str]:
    """M5 row repair (knr_property.py:50-55)."""
    if cells and str(cells[0]).startswith("Total"):
        parts = str(cells[0]).split(" ")
        if len(parts) >= 3 and len(cells) >= 7:
            cells = list(cells)
            cells[0] = parts[0]
            cells[5] = parts[1]
            cells[6] = parts[2]
    return cells


def extract(payload: str) -> dict:
    rows = [r for r in payload.split("\n") if r != ""]
    if not rows:
        return {"extracted_text": "", "spans": [], "records": [], "parse_errors": 0}
    header = [normalize_ws(c).strip() for c in rows[0].split(_DELIM)]
    # bug-for-bug (knr_property.py:9-13,44-46): the reference keys a dict
    # by header NAME (duplicates collapse to one column, first-occurrence
    # order) and assigns row cells POSITIONALLY over the deduped names —
    # extra trailing cells are silently ignored. A row with fewer cells
    # than deduped columns IndexErrors in the reference; here it counts a
    # parse error (per-row quarantine design) instead of crashing.
    names = list(dict.fromkeys(header))
    records: list[dict] = []
    errors = 0
    for raw in rows[1:]:  # F10 header skip
        cells = [normalize_ws(c) for c in raw.split(_DELIM)]
        if len(cells) < len(names):
            errors += 1
            continue
        cells = enrich_row(cells)
        records.append({name: cells[i] for i, name in enumerate(names)})
    kept = "\n".join(normalize_ws(r) for r in rows)
    return {
        "extracted_text": kept,
        "spans": [],
        "records": records,
        "parse_errors": errors,
    }
