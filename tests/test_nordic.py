"""Unit tests for the nordic invoice extractor (X2/X3/M7/M8).

Expected values are hand-derived from the reference regex battery
(nordic-invoice.py:8-23) applied to a fixed payload — not produced by the
code under test.
"""

from pdf_extractors_spark.extractors import nordic

PAYLOAD = """Invoice 3056313   Invoice Date: 25.03.2022   Due Date: 08.04.2022
Customer Number: 1415
Order No.: 729360  Ext. order no. : KO2100567-2
Loading date 26.01.2022  Delivery date 04.04.2022
Vessel Name: AL ZUBARA - 0017W Container type: 40DC
Port of loading: CNNBG   Port of delivery: NOMSS
Total amount without VAT 475,00 NOK   Tour No.: 310613
Order No.: 729361  Ext. order no. : KO2100568-1
Loading date 27.01.2022
Vessel Name: MAERSK EDI - 0042E Container type: 20DC
Port of loading: SEGOT   Port of delivery: DEHAM
Total amount without VAT 1 250,50 NOK   Tour No.: 310614"""


def test_header_fields_carried():
    out = nordic.extract(PAYLOAD)
    assert len(out["records"]) == 2
    for rec in out["records"]:
        # M7: header fields from segment 0 on every record
        assert rec["invoice"] == "3056313"
        assert rec["invoice_date"] == "25.03.2022"
        assert rec["due_date"] == "08.04.2022"
        assert rec["customer_number"] == "1415"


def test_segment_fields():
    rec0, rec1 = nordic.extract(PAYLOAD)["records"]
    assert rec0["order_no"] == "729360"
    assert rec0["ext_order_no"] == "KO2100567-2"
    assert rec0["vessel_name"] == "AL ZUBARA - 0017W"
    assert rec0["port_of_loading"] == "CNNBG"
    assert rec0["port_of_delivery"] == "NOMSS"
    assert rec0["total_amount_without_vat"] == "475,00 NOK"
    assert rec0["tour_no"] == "310613"
    assert rec1["order_no"] == "729361"
    # thousands-grouped amount (nordic-invoice.py:20)
    assert rec1["total_amount_without_vat"] == "1 250,50 NOK"


def test_forward_fill_delivery_date():
    # M8: record 1 has no Delivery date → filled from record 0
    rec0, rec1 = nordic.extract(PAYLOAD)["records"]
    assert rec0["delivery_date"] == "04.04.2022"
    assert rec1["delivery_date"] == "04.04.2022"


def test_colon_prefix_repair():
    # X3 quirk (nordic-invoice.py:69-70): fragment starting with ':' is
    # re-prefixed so the Order No. pattern matches.
    payload = "Invoice 1 Invoice Date: 01.01.2021 Due Date: 02.01.2021 Customer Number: 7\nOrder No.: 111  Tour No.: 9"
    recs = nordic.extract(payload)["records"]
    assert recs[0]["order_no"] == "111"


def test_spans_anchor_to_payload():
    out = nordic.extract(PAYLOAD)
    for span in out["spans"]:
        assert PAYLOAD[span["start"] : span["end"]] == span["value"]


def test_no_items_no_records():
    out = nordic.extract("Invoice 77 Invoice Date: 01.01.2021\nplain text")
    assert out["records"] == []
