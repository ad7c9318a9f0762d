"""Golden-fidelity tests: inputs reconstructed from the reference's
committed golden CSVs; expected values are the golden rows themselves.

* roman-census/persons.csv rows 0-2 (the Harthotes household 11-Ar-l) —
  exercises X4 name, X6 sex, X7 age, X9 occupation ('priest of X' suffix
  capture), X10 father/mother, X11 relation cascade, J1 declarant-id
  match, J5 declarant-centric resolution with bidirectional updates.
* nordic-logistics-invoice/invoice_output_data.csv row 0 field values.
* mobil-oil/output/extracted_table.csv row 1 — NOTE the committed golden
  has spaced engine names ('V6 3.0L F.I. Turbo') while the reference CODE
  de-spaces the engine line (mobil-oil-extractor.py:97); we match the
  code, and this test pins that documented choice.
"""

from pdf_extractors_spark.extractors import census_household as hh
from pdf_extractors_spark.extractors import census_persons as pp
from pdf_extractors_spark.extractors import mobil, nordic

CENSUS_PAGE_LINES = [
    "HOUSEHOLD NO.: 11-Ar-l",
    "Source: P.Mil. I 3 (cf. BL 6.75, 7.101) + P.Col.inv. 8: GRBS 32 (1991) 255-65",
    "Prov., Date: Theadelphia (Arsinoite), 22/1/12",
    "Declarant: Harthotes s. Marres, public farmer and priest of Tothoes, 55",
    "Family members:",
    "(1) Harthotes [declarant] s. Marres and Esersythis, public farmer and priest of Tothoes, 55",
    "(2) Harpatothoes s. Harthotes [declarant] and Taanchoriphis, 9",
    "(3) Esersythis d. Pasion, mother of declarant, 70",
    "Verif./photo: P.Mil I 3: PI. IV; P.Col.inv. 8: original; plate of both in GRBS.",
    "Discussion: Complete. Cf. above, p. 4.",
]


def _persons():
    households = hh.enrich(hh.parse_households(CENSUS_PAGE_LINES))
    assert len(households) == 1
    return {p["id"]: p for p in pp.resolve_household(households[0])}


def test_golden_harthotes_declarant_row():
    # persons.csv row 0
    persons = _persons()
    p = persons["11-Ar-l-d1"]
    assert p["name"] == "Harthotes"
    assert p["sex"] == "male"
    assert p["age"] == "55"
    assert p["occupation"] == "public farmer and priest of Tothoes"
    assert p["father"] == "Marres"
    assert p["mother"] == "11-Ar-l-FM2"  # resolved to Esersythis' id (J5)
    assert p["children"] == ["11-Ar-l-FM1"]
    assert p["relation_to_declarant"] == "self"
    assert p["role"] == "family member"


def test_golden_harthotes_son_row():
    # persons.csv row 1
    persons = _persons()
    p = persons["11-Ar-l-FM1"]
    assert p["name"] == "Harpatothoes"
    assert p["sex"] == "male"
    assert p["age"] == "9"
    assert p["father"] == "11-Ar-l-d1"  # overwritten by J5 children pass
    assert p["mother"] == "Taanchoriphis"
    assert p["relation_to_declarant"] == "son"


def test_golden_harthotes_mother_row():
    # persons.csv row 2
    persons = _persons()
    p = persons["11-Ar-l-FM2"]
    assert p["name"] == "Esersythis"
    assert p["sex"] == "female"
    assert p["age"] == "70"
    assert p["father"] == "Pasion"
    assert p["children"] == ["11-Ar-l-d1"]
    assert p["relation_to_declarant"] == "mother"


def test_golden_household_wide_row():
    # household.csv row 0 shape
    households = hh.enrich(hh.parse_households(CENSUS_PAGE_LINES))
    wide = hh.to_wide_rows(households)[0]
    assert wide["household_number_year"] == "11"
    assert wide["household_number_location"] == "Ar"
    assert wide["household_number_order"] == "l"  # lowercase-L OCR quirk kept
    assert wide["declarant_name_1"] == "Harthotes"
    assert wide["declarant_ids"] == ["11-Ar-l-d1"]
    assert wide["declarant_occupation"] == "public farmer and priest of Tothoes"
    assert wide["number_of_family_members"] == 3
    assert wide["discussion_indicates_substantive_record_brokenness"] == "No"


NORDIC_PAGE = """Invoice 3056313   Invoice Date: 25.03.2022   Due Date: 08.04.2022
Customer Number: 1415
Order No.: 729360  Ext. order no. : KO2100567-2
Loading date 26.01.2022  Delivery date 04.04.2022
Vessel Name: AL ZUBARA - 0017W Container type: 40DC
Port of loading: CNNBG   Port of delivery: NOMSS
Total amount without VAT 475,00 NOK   Tour No.: 310613"""


def test_golden_nordic_row0():
    # invoice_output_data.csv row 0
    rec = nordic.extract(NORDIC_PAGE)["records"][0]
    assert rec == {
        "invoice": "3056313",
        "invoice_date": "25.03.2022",
        "order_no": "729360",
        "ext_order_no": "KO2100567-2",
        "customer_number": "1415",
        "loading_date": "26.01.2022",
        "delivery_date": "04.04.2022",
        "vessel_name": "AL ZUBARA - 0017W",
        "port_of_loading": "CNNBG",
        "port_of_delivery": "NOMSS",
        "total_amount_without_vat": "475,00 NOK",
        "due_date": "08.04.2022",
        "tour_no": "310613",
    }


MOBIL_PAGE = "\n".join(
    [
        "FILTERS FOR PASSENGER CARS AND LIGHT TRUCKS/ FILTRES POUR VOITURES PARTICULIERES ET",
        "Oil",
        "ACURA",
        "2023",
        "MDX",
        "V6 3.0L F.I. Turbo",
        "M1-110 M1-110A",
        "V6 3.5L F.I.",
        "M1-110 M1-110A",
    ]
)


def test_golden_mobil_rows():
    # extracted_table.csv rows 1-2 SHAPE, values per the CODE's semantics:
    # mobil-oil-extractor.py:97 de-spaces the line before both the engine
    # assignment and the oil findall (line 108), so 'M1-110 M1-110A'
    # becomes 'M1-110M1-110A' and the OIL pattern's trailing \w greedily
    # captures 'M1-110M' (one code, not two). The committed golden CSV
    # ('M1-110', 'M1-110A', spaced engines) predates that code; SURVEY §7
    # defines parity against reference BEHAVIOR, i.e. the runnable code.
    recs = mobil.extract(MOBIL_PAGE, page_number=6)["records"]
    assert len(recs) == 2
    assert recs[0]["manufacturer"] == "ACURA"
    assert recs[0]["year"] == "2023"
    assert recs[0]["model"] == "MDX"
    assert recs[0]["engine"] == "V63.0LF.I.Turbo"
    assert recs[0]["oil"] == ["M1-110M"]
    assert recs[1]["engine"] == "V63.5LF.I."


# ---- reference-quirk parity (divergences found and fixed in review) ----


def test_electric_gas_merge_matches_reference_stripping():
    """mobil-oil-extractor.py:97-105 strips spaces BEFORE the
    (Electric/Gas) comparisons, so the spaced Mexico/Canada variants can
    never match: they must be treated as a NEW engine (emit + reset)."""
    from pdf_extractors_spark.extractors import mobil

    lines = [
        mobil._MARKER, "Oil",
        "TOYOTA", "2020", "Camry", "V6-3.5L", "M1-111A",
        "(Electric/Gas)",            # spaceless: merges into the engine
        "M1-222A",
        "Prius", "L4-1.8L", "M1-333A",
        "(Electric/Gas) (Mexico)",   # spaced: becomes a NEW engine
        "M1-444A",
    ]
    recs = mobil.extract("\n".join(lines))["records"]
    assert recs[0]["engine"] == "V6-3.5L (Electric/Gas)"
    assert recs[0]["oil"] == ["M1-111A", "M1-222A"]
    # the spaced variant emitted the pending record and took over as engine
    assert recs[1]["engine"] == "L4-1.8L"
    assert recs[1]["oil"] == ["M1-333A"]
    assert recs[2]["engine"] == "(Electric/Gas)(Mexico)"
    assert recs[2]["oil"] == ["M1-444A"]


def test_remove_declarant_entry_skips_after_removal():
    """persons.py:514-518 mutates the list during iteration: the element
    following each removal is skipped."""
    from pdf_extractors_spark.extractors import census_persons

    p = {"siblings": ["Thais [declarant]", "Taor [declarant]", "X"]}
    census_persons.remove_declarant_entry([p], "siblings")
    assert p["siblings"] == ["Taor [declarant]", "X"]


def test_declarant_stale_carry_over():
    """household.py:307-319 initializes `matches` once before the segment
    loop: a non-matching segment re-appends the previous declarant."""
    from pdf_extractors_spark.extractors import census_household

    got = census_household.get_parsed_declarants("Harpalos s. Dion; (2nd hand)")
    assert got == ["Harpalos", "Harpalos"]


def test_ffiec_left_of_first_column_goes_to_phantom_key():
    """ffiec-census.py:50-58 returns '' for a span left of the first
    header column — it must NOT land in the first real column."""
    from pdf_extractors_spark.extractors import ffiec

    payload = "\n".join([
        "50.0|40.0|Arial,Bold|County Code",
        "150.0|40.0|Arial,Bold|Name",
        "",
        "10.0|52.0|Arial|stray",      # left of every header column
        "55.0|52.0|Arial|031",
        "155.0|52.0|Arial|Ada",
    ])
    recs = ffiec.extract(payload)["records"]
    assert recs == [{"County Code": "031", "Name": "Ada", "": "stray"}]


def test_ruled_duplicate_headers_and_extra_cells_positional():
    """knr_property.py:9-13,44-46: duplicate header names collapse to one
    first-occurrence column; row cells assign positionally over the
    deduped names; extra trailing cells are ignored."""
    from pdf_extractors_spark.extractors import ruled

    payload = "A│B│A│C\nc0│c1│c2│c3"
    recs = ruled.extract(payload)["records"]
    assert recs == [{"A": "c0", "B": "c1", "C": "c2"}]


def test_patch_household_with_empty_family_is_quarantined():
    """household.py:427-435's 187-Ar-4 patch IndexErrors on an empty
    family list, exactly as the reference would — the dispatch-level
    quarantine converts that to parse_errors=1 instead of a job crash."""
    from pdf_extractors_spark.extractors import dispatch

    payload = "\n".join([
        "Catalogue of census declarations", "312",
        "HOUSEHOLD NO.: 187-Ar-4",
        "Source: P.Mich. 1 (1)",
        "Prov., Date: Tebtynis (Arsinoite), 187",
        "Declarant: Harthotes s. Petesouchos, weaver, 45",
        "Family members:",
        "Verif./photo: BL",
        "Discussion: Register.",
    ])
    out = dispatch.extract_one("census_page", payload)
    assert out["parse_errors"] == 1
    assert out["records"] == []
