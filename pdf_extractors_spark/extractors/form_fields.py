"""AcroForm field extraction + question mapping (payload family ``form_page``).

Re-expresses the reference's form tooling:

* field scan S10 — ``page.widgets()`` yields (field_name, field_value,
  field_type) with the 0-7 type-code table (playground/pdf.py:7-27);
  payloads serialize one widget per line as ``name|value|type_code``,
* question→fields mapping — the ``pdf_to_questions_mapping 1.json`` model
  (pdf-form-to-excel/): each question has ``answer_type`` (Boolean / Text /
  Select_One / Select_Multiple) and a list of pdf fields, checkboxes
  carrying a ``sheet_value``; resolution picks the checked box's
  sheet_value (Select_One), all checked values (Select_Multiple), the
  text value (Text), or checked-ness (Boolean).

In Spark the mapping rides as a broadcast dict into the Arrow batch
(SURVEY.md §1.4: MapType / broadcast dict into the UDF).
"""

from __future__ import annotations

# playground/pdf.py:17-25
FIELD_TYPES = {
    0: "Text Field",
    1: "Check Box",
    2: "Radio Button",
    3: "List Box",
    4: "Drop-down List",
    5: "Button",
    7: "Text Area",
}

# Default question mapping, shaped exactly like the reference's JSON
# (pdf-form-to-excel/pdf_to_questions_mapping 1.json) but with synthetic
# question keys — ours must be self-contained (no external data).
DEFAULT_MAPPING = [
    {
        "title": "Consent given",
        "answer_type": "Boolean",
        "pdf_fields": [{"key": "consent_done", "type": "checkbox"}],
    },
    {
        "title": "Participant code",
        "answer_type": "Text",
        "pdf_fields": [{"key": "code_text", "type": "textbox"}],
    },
    {
        "title": "Group",
        "answer_type": "Select_One",
        "pdf_fields": [
            {"key": "grp_a", "type": "checkbox", "sheet_value": "A"},
            {"key": "grp_b", "type": "checkbox", "sheet_value": "B"},
            {"key": "grp_c", "type": "checkbox", "sheet_value": "C"},
        ],
    },
    {
        "title": "Interests",
        "answer_type": "Select_Multiple",
        "pdf_fields": [
            {"key": "int_sports", "type": "checkbox", "sheet_value": "Sports"},
            {"key": "int_music", "type": "checkbox", "sheet_value": "Music"},
            {"key": "int_art", "type": "checkbox", "sheet_value": "Art"},
        ],
    },
]

_CHECKED = {"Yes", "On", "1", "true", "True"}


def parse_widgets(payload: str) -> tuple[list[dict], int]:
    """S10: one widget per line, ``name|value|type_code``."""
    widgets: list[dict] = []
    errors = 0
    for line in payload.split("\n"):
        if line == "":
            continue
        parts = line.split("|", 2)
        if len(parts) != 3:
            errors += 1
            continue
        name, value, type_code = parts
        try:
            code = int(type_code)
        except ValueError:
            errors += 1
            continue
        widgets.append(
            {
                "field_name": name,
                "field_value": value,
                "field_type": code,
                "field_type_description": FIELD_TYPES.get(code, "Unknown Type"),
            }
        )
    return widgets, errors


def resolve_questions(widgets: list[dict], mapping: list[dict] | None = None) -> list[dict]:
    """Apply the question mapping to a widget set → one row per question."""
    mapping = mapping if mapping is not None else DEFAULT_MAPPING
    by_name = {w["field_name"]: w for w in widgets}
    rows: list[dict] = []
    for question in mapping:
        atype = question["answer_type"]
        answer: str | None = None
        if atype == "Boolean":
            field = by_name.get(question["pdf_fields"][0]["key"])
            answer = "Yes" if field and field["field_value"] in _CHECKED else "No"
        elif atype == "Text":
            field = by_name.get(question["pdf_fields"][0]["key"])
            answer = field["field_value"] if field else None
        elif atype == "Select_One":
            for pf in question["pdf_fields"]:
                field = by_name.get(pf["key"])
                if field and field["field_value"] in _CHECKED:
                    answer = pf.get("sheet_value")
                    break
        elif atype == "Select_Multiple":
            picked = [
                pf.get("sheet_value")
                for pf in question["pdf_fields"]
                if (f := by_name.get(pf["key"])) and f["field_value"] in _CHECKED
            ]
            answer = ";".join(v for v in picked if v) if picked else None
        rows.append(
            {
                "question": question["title"],
                "answer_type": atype,
                "answer": answer,
            }
        )
    return rows


def extract(payload: str) -> dict:
    widgets, errors = parse_widgets(payload)
    questions = resolve_questions(widgets)
    return {
        "extracted_text": "\n".join(
            f"{w['field_name']}={w['field_value']}" for w in widgets
        ),
        "spans": [],
        "records": [{"widgets": widgets, "questions": questions}],
        "parse_errors": errors,
    }
