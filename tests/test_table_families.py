"""Unit tests for the ffiec coordinate-table, ruled-table and fixed-width
extractors (S3/S5/S6, X1, M4/M5/M6, F5-F8, F10, X13)."""

from pdf_extractors_spark.extractors import ffiec, fixedwidth, ruled
from pdf_extractors_spark.fixtures.payloads import FIXED_BOUNDS

# ------------------------------------------------------------------- ffiec

FFIEC_PAYLOAD = "\n".join(
    [
        "30.0|40.0|Arial,Bold|State Code",
        "90.0|40.0|Arial,Bold|County Code",
        "150.0|40.0|Arial,Bold|Tract Code",
        "",
        "31.5|52.0|Arial|06",
        "93.2|52.0|Arial|001",
        "154.0|52.0|Arial|0042.01",
        "200.0|52.0|Arial,Bold|heading noise",
        "",
        "32.0|64.0|Arial|06",
        "151.0|64.0|Arial|0042.02",  # no County Code → dropped (F6)
        "",
    ]
)


def test_ffiec_header_and_assignment():
    recs = ffiec.extract(FFIEC_PAYLOAD)["records"]
    assert len(recs) == 1
    assert recs[0] == {
        "State Code": "06",
        "County Code": "001",
        "Tract Code": "0042.01",
    }


def test_ffiec_font_filter():
    # F5: the Arial,Bold heading span never lands in a column
    recs = ffiec.extract(FFIEC_PAYLOAD)["records"]
    assert "heading noise" not in recs[0].values()


def test_ffiec_interval_lookup_below_first_header():
    # M4: x below the first header column goes to the reference's phantom
    # '' key (ffiec-census.py:50-58 returns the initial
    # previous_column_value), NOT the first real column
    payload = "30.0|1|Arial,Bold|A\n90.0|1|Arial,Bold|County Code\n\n5.0|2|Arial|v\n95.0|2|Arial|c\n"
    recs = ffiec.extract(payload)["records"]
    assert recs[0][""] == "v"
    assert recs[0]["A"] is None


# ------------------------------------------------------------------- ruled

RULED_PAYLOAD = "\n".join(
    [
        "Date│Payee /\tPayer│Type│Reference│Description│Income│Expense│Balance",
        "01/20/2023│Acme\rCorp│Payment│REF-1│Rent│100.00│0.00│1,100.00",
        "Total 7,585.00 250.00│││││││",
    ]
)


def test_ruled_header_normalized():
    recs = ruled.extract(RULED_PAYLOAD)["records"]
    assert "Payee /  Payer".replace("  ", " ") or True
    assert list(recs[0].keys())[1] == "Payee / Payer"


def test_ruled_cell_whitespace_normalized():
    recs = ruled.extract(RULED_PAYLOAD)["records"]
    assert recs[0]["Payee / Payer"] == "Acme Corp"  # X1: \r → space


def test_ruled_total_row_repair():
    # M5 (knr_property.py:50-55): merged Total cell re-split into 0,5,6
    recs = ruled.extract(RULED_PAYLOAD)["records"]
    total = recs[1]
    assert total["Date"] == "Total"
    assert total["Income"] == "7,585.00"
    assert total["Expense"] == "250.00"


def test_ruled_header_skip():
    recs = ruled.extract(RULED_PAYLOAD)["records"]
    assert all(r["Date"] != "Date" for r in recs)


# --------------------------------------------------------------- fixedwidth


def _row(cells):
    out = []
    for i, cell in enumerate(cells):
        width = FIXED_BOUNDS[i + 1] - FIXED_BOUNDS[i]
        out.append(cell[: width - 1].ljust(width))
    return "".join(out).rstrip()


FW_HEADER = ["LOC", "NUM", "X", "CS", "SIZE", "Y", "DESCRIPTION", "Z", "PRICE", "DISC", "PRICE2", "DEPOSIT TOTAL", "TOTAL"]
FW_DATA = ["1", "54321", "x", "10", "12/12", "|", "COKE 12OZ CAN", "z", "12.50", "0.50", "11.88", "1.20", "125.00"]
FW_JUNK = ["", "x", "", "toolongsize", "", "", "junk", "", "", "", "", "", ""]


def test_fixedwidth_filters_and_scrubs():
    payload = "\n".join([_row(FW_HEADER), _row(FW_DATA), _row(FW_JUNK)])
    recs = fixedwidth.extract(payload)["records"]
    assert len(recs) == 2  # junk row dropped by F7
    header, data = recs
    assert header["is_header"]
    assert data["loc"] == "1"
    assert data["num"] == "54321"
    assert data["cases"] == "10"
    assert data["size"] == "12/12"
    assert data["description"] == "COKE 12OZ CAN"
    assert data["price"] == "12.50"
    assert data["total"] == "125.00"


def test_fixedwidth_junk_row_predicates():
    # F7: len(col1)<2 or len(col4)<2 or len(col4)>=7 → dropped
    payload = "\n".join([_row(FW_HEADER), _row(FW_JUNK)])
    recs = fixedwidth.extract(payload)["records"]
    assert len(recs) == 1  # only header survives


def test_fixedwidth_pipe_scrub():
    data = list(FW_DATA)
    data[6] = "COKE | 12OZ"
    payload = "\n".join([_row(FW_HEADER), _row(data)])
    recs = fixedwidth.extract(payload)["records"]
    assert recs[1]["description"] == "COKE  12OZ"  # X13: '|' removed
