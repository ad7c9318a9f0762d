"""Unit tests for the AcroForm field family (S10 + question mapping) and
the M9 multi-row cell explode."""

from pdf_extractors_spark.extractors import form_fields

PAYLOAD = "\n".join(
    [
        "consent_done|Yes|1",
        "code_text|AH42|0",
        "grp_a|Off|1",
        "grp_b|Yes|1",
        "grp_c|Off|1",
        "int_sports|Yes|1",
        "int_music|Off|1",
        "int_art|Yes|1",
        "extra_button||5",
    ]
)


def test_widget_scan_and_type_map():
    widgets, errors = form_fields.parse_widgets(PAYLOAD)
    assert errors == 0
    assert len(widgets) == 9
    by = {w["field_name"]: w for w in widgets}
    assert by["code_text"]["field_type_description"] == "Text Field"
    assert by["consent_done"]["field_type_description"] == "Check Box"
    assert by["extra_button"]["field_type_description"] == "Button"
    # unknown code maps like playground/pdf.py:25
    w, _ = form_fields.parse_widgets("x|y|6")
    assert w[0]["field_type_description"] == "Unknown Type"


def test_question_resolution():
    out = form_fields.extract(PAYLOAD)
    questions = {q["question"]: q["answer"] for q in out["records"][0]["questions"]}
    assert questions["Consent given"] == "Yes"
    assert questions["Participant code"] == "AH42"
    assert questions["Group"] == "B"  # Select_One: first checked sheet_value
    assert questions["Interests"] == "Sports;Art"  # Select_Multiple join


def test_select_one_unanswered():
    out = form_fields.extract("grp_a|Off|1\ngrp_b|Off|1")
    questions = {q["question"]: q["answer"] for q in out["records"][0]["questions"]}
    assert questions["Group"] is None


def test_malformed_widget_counted():
    _, errors = form_fields.parse_widgets("only_one_part\nname|val|notanint")
    assert errors == 2


def test_explode_multirow_cells(spark):
    from pdf_extractors_spark import pipeline

    df = spark.createDataFrame(
        [("r1", "a\nb", "x"), ("r2", "c", "y\nz\nw")],
        "id string, c1 string, c2 string",
    )
    out = pipeline.explode_multirow_cells(df, ["c1", "c2"])
    rows = {(r["id"], r["part_no"]): (r["c1"], r["c2"]) for r in out.collect()}
    # M9: max_splits rows; shorter cells repeat their FIRST part
    assert rows == {
        ("r1", 0): ("a", "x"),
        ("r1", 1): ("b", "x"),
        ("r2", 0): ("c", "y"),
        ("r2", 1): ("c", "z"),
        ("r2", 2): ("c", "w"),
    }
