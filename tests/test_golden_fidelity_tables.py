"""Golden-fidelity tests for the table families, inputs reconstructed from
the reference's committed golden CSVs:

* us-ffiec-demographic-Info/output_table...csv row 0 — header x-interval
  column assignment (M4), Arial font filter (F5), County-Code row validity
  (F6), dollar-formatted strings carried as text (SURVEY §1.2).
* knr-property-mgmt/knr_statement_output_data.csv — header-inferred schema,
  embedded-newline cell normalization (X1), Total-row repair (M5).
"""

from pdf_extractors_spark.extractors import ffiec, ruled

# Reconstructed span stream for the golden row
# 06,059,0011.01,Middle,No,98.31,"$127,800",...
FFIEC_PAYLOAD = "\n".join(
    [
        "30.0|40.0|Arial,Bold|State Code",
        "80.0|40.0|Arial,Bold|County Code",
        "130.0|40.0|Arial,Bold|Tract Code",
        "200.0|40.0|Arial,Bold|Tract Income Level",
        "280.0|40.0|Arial,Bold|Distressed or Underserved Tract",
        "360.0|40.0|Arial,Bold|Tract Median Family Income %",
        "440.0|40.0|Arial,Bold|2023 FFIEC Est.MSA/MD non- MSA/MD Median Family Income",
        "",
        "31.0|52.0|Arial|06",
        "82.5|52.0|Arial|059",
        "133.0|52.0|Arial|0011.01",
        "201.0|52.0|Arial|Middle",
        "283.0|52.0|Arial|No",
        "362.0|52.0|Arial|98.31",
        "445.0|52.0|Arial|$127,800",
        "",
    ]
)


def test_golden_ffiec_row0():
    recs = ffiec.extract(FFIEC_PAYLOAD)["records"]
    assert recs == [
        {
            "State Code": "06",
            "County Code": "059",
            "Tract Code": "0011.01",
            "Tract Income Level": "Middle",
            "Distressed or Underserved Tract": "No",
            "Tract Median Family Income %": "98.31",
            "2023 FFIEC Est.MSA/MD non- MSA/MD Median Family Income": "$127,800",
        }
    ]


def test_golden_ffiec_dollar_amounts_stay_text():
    # SURVEY §1.2: money columns carried as formatted strings, never parsed
    recs = ffiec.extract(FFIEC_PAYLOAD)["records"]
    v = recs[0]["2023 FFIEC Est.MSA/MD non- MSA/MD Median Family Income"]
    assert v == "$127,800" and isinstance(v, str)


# knr golden: header + a receipt row whose description wraps across lines
# (the golden CSV shows the embedded newline preserved inside the cell;
# after X1 normalization it becomes a single space)
KNR_PAYLOAD = "\n".join(
    [
        "Date│Payee / Payer│Type│Reference│Description│Income│Expense│Balance",
        "││││Beginning Cash Balance as of 01/01/2022│││0.00",
        "01/20/2023│Drew A. Siegel│Receipt││Ansley's Way 1323 Unit B - Mgmt Held Security\rDeposits│250.00││250.00",
        "Total 7,585.00 250.00│││││││",
    ]
)


def test_golden_knr_rows():
    recs = ruled.extract(KNR_PAYLOAD)["records"]
    assert len(recs) == 3
    assert recs[0]["Description"] == "Beginning Cash Balance as of 01/01/2022"
    assert recs[0]["Balance"] == "0.00"
    assert recs[1]["Date"] == "01/20/2023"
    assert recs[1]["Payee / Payer"] == "Drew A. Siegel"
    # X1: the wrapped description is whitespace-normalized
    assert "\r" not in recs[1]["Description"]
    # M5 repair: the merged Total row lands in Date/Income/Expense
    assert recs[2]["Date"] == "Total"
    assert recs[2]["Income"] == "7,585.00"
    assert recs[2]["Expense"] == "250.00"
