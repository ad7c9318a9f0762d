"""Unit tests for the mobil-oil catalog extractor (F2/F4/M3/A2)."""

from pdf_extractors_spark.extractors import mobil

MARKER = "FILTERS FOR PASSENGER CARS AND LIGHT TRUCKS/ FILTRES POUR VOITURES PARTICULIERES ET"

PAYLOAD = "\n".join(
    [
        "junk preamble",
        MARKER,
        "VEHICULES UTILITAIRES LEGERS/ FILTROS PARA AUTOMOVILES Y CAMIONES LIGEROS",
        "MANUFACTURER-MODEL-ENGINE",
        "Oil",
        "ACURA",
        "2023",
        "MDX",
        "V6-3.5L",
        "M1-110A M1-110A M1-212B",
        "2024",
        "MDX",
        "V6-3.5L",
        "M1-110A",
    ]
)


def test_state_machine_emits_on_year_transition():
    out = mobil.extract(PAYLOAD)
    recs = out["records"]
    assert len(recs) == 2
    assert recs[0]["manufacturer"] == "ACURA"
    assert recs[0]["year"] == "2023"
    assert recs[0]["model"] == "MDX"
    assert recs[0]["engine"] == "V6-3.5L"
    assert recs[1]["year"] == "2024"


def test_oil_dedup_is_deterministic_first_occurrence():
    # A2: reference uses list(set(...)) (hash-order); ours is
    # first-occurrence order — deterministic under any PYTHONHASHSEED.
    out = mobil.extract(PAYLOAD)
    assert out["records"][0]["oil"] == ["M1-110A", "M1-212B"]


def test_prefix_trim():
    # F4: everything before the marker line is dropped
    lines = mobil.remove_duplicate_lines(["a", "b", MARKER, "c"])
    assert lines == [MARKER, "c"]


def test_valid_line_stop_list():
    # F2 (mobil-oil-extractor.py:6-29)
    assert not mobil.valid_line("MANUFACTURER-MODEL-ENGINE")
    assert not mobil.valid_line("Recommended. something")
    assert not mobil.valid_line("550 Synthetic Oil Application. etc")
    assert mobil.valid_line("ACURA")


def test_no_oil_latch_no_records():
    # the 'Oil' validity latch (mobil-oil-extractor.py:111-112): without
    # it nothing is parsed
    payload = "\n".join([MARKER, "ACURA", "2023", "MDX", "V6-3.5L", "M1-110A"])
    assert mobil.extract(payload)["records"] == []


def test_electric_gas_suffix_merge():
    payload = "\n".join(
        [MARKER, "Oil", "TOYOTA", "2023", "Camry", "L4-2.5L", "(Electric/Gas)", "M1-110A"]
    )
    recs = mobil.extract(payload)["records"]
    assert recs[0]["engine"] == "L4-2.5L (Electric/Gas)"
