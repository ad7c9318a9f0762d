"""Family dispatch: ``tool`` tag → extractor, plus the unified output row.

The unified ``extracted`` schema (FIXTURES.md §3)::

    conv_id string, turn_idx int, kind string, extracted_text string,
    spans array<struct<label string, start int, end int, value string>>,
    records string (JSON of family-specific golden rows),
    parse_errors int

The census family chains both stages (household.py stage A then
persons.py stage B) inside one per-document pass — households never span
turns, so the entity-resolution join J1-J7 needs no shuffle at all
(SURVEY.md §7: resolution co-location).
"""

from __future__ import annotations

import json

try:  # optional fast path; formatting matched by the stdlib fallback
    import orjson as _orjson
except ImportError:  # pragma: no cover
    _orjson = None


def dumps_records(records: list) -> str:
    """Canonical records serialization (sorted keys, compact separators,
    UTF-8 unescaped). orjson when present (~3x faster — json.dumps is
    ~15% of the extraction kernel), stdlib with matching formatting
    otherwise, so the bytes are identical either way. Records carry only
    str/int/None/list/dict — no floats, whose formatting could differ."""
    if _orjson is not None:
        try:
            return _orjson.dumps(records, option=_orjson.OPT_SORT_KEYS).decode()
        except (TypeError, ValueError):
            # orjson is stricter than stdlib (lone surrogates, non-str
            # keys); fall back rather than failing the Spark task and
            # bypassing the parse_errors quarantine design
            pass
    return json.dumps(
        records, ensure_ascii=False, sort_keys=True, separators=(",", ":")
    )

from . import (
    census_household,
    census_persons,
    ffiec,
    fixedwidth,
    form_fields,
    html_content,
    mobil,
    nordic,
    ruled,
)


def _extract_census(payload: str) -> dict:
    result = census_household.extract(payload)
    raw_households = result["records"][0]["raw"] if result["records"] else []
    persons = []
    for hh in raw_households:
        persons.extend(census_persons.resolve_household(hh))
    households = result["records"][0]["households"] if result["records"] else []
    result["records"] = [{"households": households, "persons": persons}]
    return result


EXTRACTORS = {
    "invoice_ocr": nordic.extract,
    "census_page": _extract_census,
    "catalog_page": mobil.extract,
    "coord_table": ffiec.extract,
    "ruled_table": ruled.extract,
    "fixedwidth_table": fixedwidth.extract,
    "html_page": html_content.extract,
    "form_page": form_fields.extract,
}


def extract_one(kind: str, payload: str) -> dict:
    """Extract one turn payload; unknown kinds fall back to the
    main-content extractor (sniffing, SURVEY.md §7 step 4)."""
    fn = EXTRACTORS.get(kind, html_content.extract)
    try:
        out = fn(payload)
    except Exception:
        # per-row quarantine instead of the reference's fail-stop
        # try/except (persons.py:806-808) — counted, not fatal.
        return {"extracted_text": "", "spans": [], "records": [], "parse_errors": 1}
    return out


def to_row(conv_id: str, turn_idx: int, kind: str, payload: str) -> dict:
    out = extract_one(kind, payload)
    return {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "kind": kind,
        "extracted_text": out["extracted_text"],
        "spans": out["spans"],
        "records": dumps_records(out["records"]),
        "parse_errors": out["parse_errors"],
    }
