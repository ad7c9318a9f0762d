"""Unit tests for the roman-census extractors: stage A (M1/M2/X12/X14-X19/
M10) and stage B (X4-X11, J1-J7) — expectations hand-derived from the
reference's semantics (household.py / persons.py)."""

from pdf_extractors_spark.extractors import census_household as hh
from pdf_extractors_spark.extractors import census_persons as pp

PAGE = "\n".join(
    [
        "Catalogue of census declarations",  # page header (skipped)
        "117",
        "HOUSEHOLD NO.: 131-He-2",
        "Source: P.Mich. 594 (12)",
        "Prov., Date: Theadelphia (Arsinoite), 131",
        "Declarant: Harthotes s. Petos, public farmer, 50",
        "Family members:",
        "(1) Harthotes [declarant] s. Petos and Thenatymis, public farmer, 50",
        "Cambridge Books Online © Cambridge University Press, 2010",
        "(2) Taorsenouphis d. Harthotes and Isidora, 21, wife of Harthotes [no. 1]",
        "wrapped continuation line",
        "Free non-kin:",
        "(1) Didymos s. Horos, 34",
        "Slaves:",
        "(1) Soeris female slave of Harthotes, 26",
        "Verif./photo: BL",
        "Discussion: Broken at top.",
    ]
)


def _households():
    return hh.enrich(hh.parse_households(PAGE.split("\n")[2:]))


def test_m1_segmentation_and_keys():
    records = _households()
    assert len(records) == 1
    rec = records[0]
    assert rec["household_number"] == "131-He-2"
    assert rec["source"] == "P.Mich. 594 (12)"
    assert rec["declarant_name"] == "Harthotes s. Petos, public farmer, 50"
    assert len(rec["name_of_family_members"]) == 2
    assert len(rec["name_of_non_family_members"]) == 1
    assert len(rec["slaves"]) == 1


def test_m2_continuation_merge():
    rec = _households()[0]
    # "wrapped continuation line" appended to member (2)
    assert rec["name_of_family_members"][1].endswith("wrapped continuation line")


def test_f1_boilerplate_skipped():
    rec = _households()[0]
    assert all("Cambridge" not in m for m in rec["name_of_family_members"])


def test_hardcoded_patch_131_He_2():
    # household.py:434-435 patch preserved bug-for-bug
    rec = _households()[0]
    assert rec["provenance"] == "Ankyronpolis (Herakleopolite), 133"


def test_wide_row():
    wide = hh.to_wide_rows(_households())[0]
    assert wide["household_number_year"] == "131"
    assert wide["household_number_location"] == "He"
    assert wide["household_number_order"] == "2"
    assert wide["declarant_name_1"] == "Harthotes"
    assert wide["declarant_name_2"] == ""
    assert wide["declarant_ids"] == ["131-He-2-d1"]
    assert wide["declarant_occupation"] == "public farmer"
    assert wide["number_of_family_members"] == 2
    assert wide["number_of_slaves"] == 1
    assert wide["discussion_indicates_substantive_record_brokenness"] == "Yes"


def test_x12_special_case_all_three_sons():
    line = "Alpha, Beta, and Gamma, all three sons of Delta"
    assert hh.get_parsed_declarants(line) == ["Alpha", "Beta", "Gamma"]


def test_x15_pads_two_part_numbers():
    assert hh.split_household_number("131-He") == ["131", "He", ""]
    assert hh.split_household_number("131 He 2") == ["131", "He", "2"]


# ----------------------------------------------------------------- stage B


def test_persons_parse_and_ids():
    persons = pp.resolve_household(_households()[0])
    ids = [p["id"] for p in persons]
    # J1: person (1) matches declarant by name → declarant id; others
    # sequential per role (X14)
    assert ids == ["131-He-2-d1", "131-He-2-FM1", "131-He-2-NK1", "131-He-2-S1"]


def test_x6_x7_fields():
    persons = pp.resolve_household(_households()[0])
    harthotes, taorsenouphis, didymos, soeris = persons
    assert harthotes["sex"] == "male"  # 's.' token
    assert harthotes["age"] == "50"
    assert taorsenouphis["sex"] == "female"  # 'd.' token
    assert didymos["role"] == "free non-kin"
    assert soeris["sex"] == "female"  # S-type classifier
    assert soeris["owner"] == "Harthotes"


def test_j2_j3_reference_join():
    # "(2) ... wife of Harthotes [no. 1]" → spouse link both directions
    persons = pp.resolve_household(_households()[0])
    harthotes, taorsenouphis = persons[0], persons[1]
    assert taorsenouphis["spouse"] == harthotes["id"]
    assert harthotes["spouse"] == taorsenouphis["id"]


def test_j2_ocr_l_for_1():
    # persons.py:696-697: '[no. l]' counts as a reference to person 1
    raw = {
        "household_number": "11-Ar-1",
        "declarant_name": None,
        "declarant_name_parsed": [],
        "declarant_id": [],
        "name_of_family_members": [
            "(1) Alpha s. Beta, 30",
            "(2) Gamma d. Alpha, 20, wife of Alpha [no. l]",
        ],
        "name_of_non_family_members": [],
        "slaves": [],
    }
    persons = pp.resolve_household(raw)
    assert persons[1]["spouse"] == persons[0]["id"]


def test_x10_grandfather_suppressed_for_117_Ar_2():
    data = "(1) Alpha s. Beta (s. Gamma), 30"
    assert pp.get_paternal_grand_father(data, "999-Xx-1") == "Gamma"
    assert pp.get_paternal_grand_father(data, "117-Ar-2") is None


def test_occupation_dictionaries_differ():
    # SURVEY §7: two copies of the dictionary must both exist
    line = "Alpha s. Beta, donkey driver, 40"
    assert hh.get_occupation(line) == "donkey driver"
    assert pp.get_occupation(line) == ""  # persons.py variant lacks it
    line2 = "Alpha s. Beta, scribe, 40"
    assert pp.get_occupation(line2) == "scribe"
    assert hh.get_occupation(line2) == ""


def test_j6_declarant_inserted_when_no_self():
    raw = {
        "household_number": "11-Ar-2",
        "declarant_name": "Alpha s. Beta, farmer, 44",
        "declarant_name_parsed": ["Alpha"],
        "declarant_id": ["11-Ar-2-d1"],
        "name_of_family_members": ["(1) Gamma d. Alpha, 12"],
        "name_of_non_family_members": [],
        "slaves": [],
    }
    persons = pp.resolve_household(raw)
    assert persons[0]["name"] == "Alpha"
    assert persons[0]["relation_to_declarant"] == "self"
    assert persons[0]["id"] == "11-Ar-2-d1"
