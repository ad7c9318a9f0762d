"""Oracle-vs-extractor equivalence OUTSIDE the fixture envelope.

The driver gate checks the DuckDB oracles against fixture data only; a
drift review found (and fixed) cases where oracle and extractor diverged
on inputs fixtures never produce. These tests pin those equivalences by
running the oracle SQL over hand-built adversarial payloads and
comparing against the Python extractors directly (no Spark needed —
the Spark queries are thin flatteners over the same extractor output,
which test_golden_fidelity_tables pins separately)."""

import json

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry
from pdf_extractors_spark.extractors import dispatch
from pdf_extractors_spark.extractors.mobil import _MARKER


def _tp(tmp_path, rows):
    """Write payload rows as the transcripts parquet shape the oracle
    generators read."""
    df = pd.DataFrame(
        [
            {
                "conv_id": c,
                "turn_idx": t,
                "role": "user",
                "text": text,
                "tool": tool,
                "ts": pd.Timestamp("2026-01-01"),
            }
            for c, t, tool, text in rows
        ]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    path = str(tmp_path / "adv.parquet")
    df.to_parquet(path)
    return path


def _records(kind, text):
    return dispatch.extract_one(kind, text)["records"]


def test_catalog_oracle_padded_year_and_stop_prefix(tmp_path):
    payload = "\n".join(
        [
            "preamble noise",
            _MARKER,
            "MANUFACTURER-MODEL-ENGINE",
            "Oil",
            "ACURA",
            " 2020",  # padded year: raw next-line check must FAIL the manuf
            "TOYOTA",
            "2021",
            "Camry",
            "V6-3.5L",
            "M1-111A",
            "Premium Filter Recommended. blah",  # stop-PREFIX line
            "Corolla",
            "L4-2.0L Turbo",
            "M1-222A",
        ]
    )
    tp = _tp(tmp_path, [("c", 0, "catalog_page", payload)])
    sql = entry._catalog_sql(tp)
    got = duckdb.sql(sql).fetchdf().sort_values("rec_no")
    exp = _records("catalog_page", payload)
    assert len(got) == len(exp)
    for row, rec in zip(got.itertuples(index=False), exp):
        assert row.manufacturer == rec["manufacturer"]
        assert row.year == rec["year"]
        assert row.model == rec["model"]
        assert row.engine == rec["engine"]
        assert row.oils == ";".join(rec["oil"])


def test_coord_oracle_phantom_column_and_empty_county(tmp_path):
    payload = "\n".join(
        [
            "50.0|40.0|Arial,Bold|County Code",
            "150.0|40.0|Arial,Bold|Tract Code",
            "",
            "10.0|52.0|Arial|stray",  # left of every header -> phantom ''
            "55.0|52.0|Arial|031",
            "155.0|52.0|Arial|0001.01",
            "",
            "55.0|64.0|Arial|",  # EMPTY County Code -> row dropped (truthiness)
            "155.0|64.0|Arial|0002.02",
        ]
    )
    tp = _tp(tmp_path, [("c", 0, "coord_table", payload)])
    got = duckdb.sql(entry._coord_sql(tp)).fetchdf()
    exp = _records("coord_table", payload)
    assert len(exp) == 1 and exp[0]["County Code"] == "031"
    assert exp[0][""] == "stray"  # phantom key held the stray span
    assert len(got) == 1
    assert got.iloc[0]["county_code"] == "031"
    assert got.iloc[0]["tract_code"] == "0001.01"


def test_ruled_oracle_extra_trailing_cells(tmp_path):
    payload = (
        "Date│Payee / Payer│Type│Reference│Description│Income│Expense│Balance\n"
        "01/02/2023│X│Payment│R1│Rent│1.00│2.00│3.00│EXTRA"
    )
    tp = _tp(tmp_path, [("c", 0, "ruled_table", payload)])
    got = duckdb.sql(entry._ruled_sql(tp)).fetchdf()
    exp = _records("ruled_table", payload)
    assert len(exp) == 1 and exp[0]["Balance"] == "3.00"
    assert len(got) == 1 and got.iloc[0]["balance"] == "3.00"


def test_form_oracle_widgetless_page_still_emits_questions(tmp_path):
    tp = _tp(tmp_path, [("c", 0, "form_page", "garbage-no-pipes")])
    got = duckdb.sql(entry._form_questions_sql(tp)).fetchdf()
    exp = _records("form_page", "garbage-no-pipes")[0]["questions"]
    assert len(exp) == 4
    assert len(got) == 4
    by_q = {r["question"]: r["answer"] for _, r in got.iterrows()}
    for q in exp:
        want = q["answer"]
        have = by_q[q["question"]]
        assert (want is None and pd.isna(have)) or want == have


def test_html_oracle_article_before_main_and_empty_main(tmp_path):
    art_first = "<html><body><article>Article body text goes here.</article><main>Main body text goes here instead.</main></body></html>"
    empty_main = "<html><body><main></main><p>Outside text that must not appear.</p></body></html>"
    tp = _tp(
        tmp_path,
        [("c", 0, "html_page", art_first), ("c", 1, "html_page", empty_main)],
    )
    got = {
        int(r["turn_idx"]): r["main_text"]
        for _, r in duckdb.sql(entry._html_main_sql(tp)).fetchdf().iterrows()
    }
    exp0 = dispatch.extract_one("html_page", art_first)["extracted_text"]
    exp1 = dispatch.extract_one("html_page", empty_main)["extracted_text"]
    assert got[0] == exp0  # leftmost match (article) wins in both
    assert got[1] == exp1 == ""  # empty <main> scopes to nothing in both


# ---------------- property-based drift (hypothesis-generated payloads) --


from hypothesis import given, settings, strategies as st

_CELL = st.text(
    alphabet=st.sampled_from(list("abcXYZ 0123456789.,-\t\r")), max_size=12
)
_NAME = st.text(alphabet=st.sampled_from(list("abc_xyz")), min_size=1, max_size=8)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.tuples(_NAME, _CELL, st.integers(0, 9)).map(
                lambda t: f"{t[0]}|{t[1]}|{t[2]}"
            ),
            st.just("badline"),
            st.just("only|two"),
            st.just(""),
        ),
        max_size=10,
    )
)
def test_form_widgets_oracle_matches_extractor(tmp_path_factory, lines):
    payload = "\n".join(lines)
    tp = _tp(tmp_path_factory.mktemp("fw"), [("c", 0, "form_page", payload)])
    got = (
        duckdb.sql(entry._form_widgets_sql(tp))
        .fetchdf()
        .sort_values(["field_name", "field_value", "field_type"])
    )
    exp = sorted(
        (
            (w["field_name"], w["field_value"], w["field_type"])
            for w in _records("form_page", payload)[0]["widgets"]
        )
    )
    got_t = sorted(
        (r["field_name"], r["field_value"], int(r["field_type"]))
        for _, r in got.iterrows()
    )
    assert got_t == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(_CELL, min_size=5, max_size=10),
        min_size=0,
        max_size=6,
    ),
    st.booleans(),
)
def test_ruled_oracle_matches_extractor(tmp_path_factory, rows, add_total):
    header = "Date│Payee / Payer│Type│Reference│Description│Income│Expense│Balance"
    lines = [header] + ["│".join(cells) for cells in rows]
    if add_total:
        lines.append("│".join(["Total 1,00 2,00", "", "", "", "", "", "", ""]))
    payload = "\n".join(ln for ln in lines if ln != "")
    tp = _tp(tmp_path_factory.mktemp("rl"), [("c", 0, "ruled_table", payload)])
    got = duckdb.sql(entry._ruled_sql(tp)).fetchdf().sort_values("row_no")
    exp = _records("ruled_table", payload)
    assert len(got) == len(exp)
    for r, rec in zip(got.itertuples(index=False), exp):
        assert r.date == rec["Date"]
        assert r.income == rec["Income"]
        assert r.balance == rec["Balance"]


_FIELD_LINES = st.sampled_from(
    [
        "Invoice 3056313   Invoice Date: 25.03.2022   Due Date: 08.04.2022",
        "Customer Number: 1415",
        "Order No.: 729360  Ext. order no. : KO2100567-2",
        "Loading date 26.01.2022  Delivery date 04.04.2022",
        "Loading date 27.02.2022",
        "Vessel Name: AL ZUBARA - 0017W Container type: 40DC",
        "Port of loading: CNNBG   Port of delivery: NOMSS",
        "Total amount without VAT 475,00 NOK   Tour No.: 310613",
        "random filler line with no fields at all",
        "",
    ]
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_FIELD_LINES, min_size=0, max_size=14))
def test_invoice_oracle_matches_extractor(tmp_path_factory, lines):
    """Random shuffles of field lines exercise segmentation, the
    header-gate (Invoice in segment 0), record emission and the
    delivery-date forward-fill in arbitrary orders."""
    payload = "\n".join(lines)
    tp = _tp(tmp_path_factory.mktemp("inv"), [("c", 0, "invoice_ocr", payload)])
    got = duckdb.sql(entry._invoice_sql(tp)).fetchdf().sort_values("rec_no")
    exp = _records("invoice_ocr", payload)
    assert len(got) == len(exp)
    for r, rec in zip(got.itertuples(index=False), exp):
        for k in ("invoice", "order_no", "delivery_date", "customer_number",
                  "total_amount_without_vat", "tour_no"):
            have = getattr(r, k)
            want = rec[k]
            assert (want is None and (have is None or have != have)) or have == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(  # groups of (manufacturer, year, [(model, engine, oils...)])
        st.tuples(
            st.sampled_from(["ACURA", "TOYOTA", "CHEVROLET TRUCKS", "SAAB"]),
            st.integers(2015, 2024),
            st.lists(
                st.tuples(
                    st.sampled_from(["MDX", "Camry", "Ram 1500", "XC90"]),
                    st.sampled_from(["V6-3.5L", "L4-2.0L Turbo", "L4-2.5L"]),
                    st.lists(st.integers(100, 999), min_size=1, max_size=3),
                    st.booleans(),  # trailing stop line
                ),
                min_size=1,
                max_size=3,
            ),
        ),
        min_size=1,
        max_size=3,
    )
)
def test_catalog_oracle_matches_extractor(tmp_path_factory, groups):
    """Grammar-shaped random catalogs (the documented fixture grammar:
    manuf, year, then model/engine/oils runs) with random SAAB groups,
    stop lines and oil-code duplicates — the reset-span oracle must
    track the state machine on all of them."""
    from pdf_extractors_spark.extractors.mobil import _MARKER

    lines = ["noise to trim", _MARKER, "MANUFACTURER-MODEL-ENGINE", "Oil"]
    for manuf, year, models in groups:
        lines.append(manuf)
        lines.append(str(year))
        for model, engine, oils, stop in models:
            lines.append(model)
            lines.append(engine)
            lines.append(" ".join(f"M1-{o}A" for o in oils))
            if stop:
                lines.append(
                    "Voir las page 2 pour une explication des renvois en bas de la page."
                )
    payload = "\n".join(lines)
    tp = _tp(tmp_path_factory.mktemp("cat"), [("c", 0, "catalog_page", payload)])
    got = duckdb.sql(entry._catalog_sql(tp)).fetchdf().sort_values("rec_no")
    exp = _records("catalog_page", payload)
    assert len(got) == len(exp)
    for r, rec in zip(got.itertuples(index=False), exp):
        assert (r.manufacturer, r.year, r.model, r.engine) == (
            rec["manufacturer"], rec["year"], rec["model"], rec["engine"]
        )
        assert r.oils == ";".join(rec["oil"])


@settings(max_examples=25, deadline=None)
@given(
    st.lists(  # data rows: subset of columns present + x jitter
        st.tuples(
            st.booleans(),              # include County Code?
            st.floats(0, 8),            # jitter
            st.sampled_from(["Low", "Middle", "Upper"]),
            st.booleans(),              # include a left-of-header stray?
        ),
        min_size=1,
        max_size=6,
    )
)
def test_coord_oracle_matches_extractor(tmp_path_factory, rows):
    cols = [(30.0, "State Code"), (90.0, "County Code"), (150.0, "Tract Income Level")]
    lines = [f"{x:.1f}|40.0|Arial,Bold|{n}" for x, n in cols] + [""]
    y = 40.0
    for has_county, jitter, level, stray in rows:
        y += 12.0
        if stray:
            lines.append(f"5.0|{y:.1f}|Arial|stray")
        lines.append(f"{30.0 + jitter:.1f}|{y:.1f}|Arial|06")
        if has_county:
            lines.append(f"{90.0 + jitter:.1f}|{y:.1f}|Arial|031")
        lines.append(f"{150.0 + jitter:.1f}|{y:.1f}|Arial|{level}")
        lines.append(f"200.0|{y:.1f}|Arial,Bold|heading noise")
        lines.append("")
    payload = "\n".join(lines)
    tp = _tp(tmp_path_factory.mktemp("co"), [("c", 0, "coord_table", payload)])
    got = duckdb.sql(entry._coord_sql(tp)).fetchdf().sort_values("row_no")
    exp = _records("coord_table", payload)
    assert len(got) == len(exp)
    for r, rec in zip(got.itertuples(index=False), exp):
        assert r.county_code == rec["County Code"]
        assert r.state_code == rec["State Code"]


@settings(max_examples=25, deadline=None)
@given(
    st.tuples(
        st.sampled_from([(117, "Ar", 3), (131, "He", 2), (187, "Ar", 4), (159, "Ox", 1)]),
        st.sampled_from(["public farmer", "priest of Soknebtynis", "weaver", "nothing known"]),
        st.integers(0, 3),   # family members
        st.booleans(),       # non-kin section
        st.booleans(),       # slaves section
        st.booleans(),       # wrapped continuation line
        st.booleans(),       # boilerplate line inside the member section
        st.booleans(),       # Broken discussion
    )
)
def test_census_wide_oracle_matches_extractor(tmp_path_factory, cfg):
    """Randomized households within the fixture grammar, including the
    131-He-2 provenance patch and the 187-Ar-4 non-kin reset, priest-of
    occupation capture, wrapped lines and interleaved boilerplate."""
    (year, loc, order), occ, n_fam, nonkin, slaves, wrapped, boiler, broken = cfg
    lines = [
        "Catalogue of census declarations",  # page-header lines [0:2] skipped
        "312",
        f"HOUSEHOLD NO.: {year}-{loc}-{order}",
        "Source: P.Mich. 123 (4)",
        f"Prov., Date: Tebtynis (Arsinoite), {year}",
        f"Declarant: Harthotes s. Petesouchos, {occ}, 45",
        "Family members:",
    ]
    for i in range(1, n_fam + 1):
        lines.append(f"({i}) Didymos s. Harthotes and Isidora, 2{i}")
        if wrapped and i == 1:
            lines.append("wrapped continuation text")
        if boiler and i == 1:
            lines.append("Cambridge Books Online © 2010")
    if nonkin:
        lines.append("Free non-kin:")
        lines.append("(1) Horos s. Taues, 30")
    if slaves:
        lines.append("Slaves:")
        lines.append("(1) Soeris female slave of Harthotes, 20")
    lines.append("Verif./photo: BL")
    lines.append("Discussion: Register." + (" Broken at top." if broken else ""))
    payload = "\n".join(lines)
    tp = _tp(tmp_path_factory.mktemp("ce"), [("c", 0, "census_page", payload)])
    got = duckdb.sql(entry._census_sql(tp)).fetchdf()
    recs = _records("census_page", payload)
    exp = recs[0]["households"] if recs else []  # [] = quarantined crash
    assert len(got) == len(exp)
    if not exp:
        return
    g, e = got.iloc[0], exp[0]
    assert g["hh_year"] == e["household_number_year"]
    assert g["hh_location"] == e["household_number_location"]
    assert g["provenance"] == e["provenance"]
    assert g["provenance_year"] == e["provenance_year"]
    assert g["declarant_name_1"] == e["declarant_name_1"]
    assert g["declarant_occupation"] == e["declarant_occupation"]
    assert int(g["n_family"]) == e["number_of_family_members"]
    assert int(g["n_nonkin"]) == e["number_of_non_family_members"]
    assert int(g["n_slaves"]) == e["number_of_slaves"]
    assert g["broken"] == e["discussion_indicates_substantive_record_brokenness"]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.tuples(  # plausible item row
                st.integers(1, 999), st.integers(10, 99999), st.integers(1, 80),
                st.sampled_from(["12/12", "24/16", "6/2L", "x", "toolong"]),
                st.floats(1, 99, allow_nan=False),
            ),
            st.just(None),  # junk row failing the length predicates
        ),
        min_size=0,
        max_size=6,
    )
)
def test_fixedwidth_oracle_matches_extractor(tmp_path_factory, rows):
    from pdf_extractors_spark.fixtures.payloads import _HEADER_CELLS, _fixed_row

    lines = [_fixed_row(_HEADER_CELLS)]
    for row in rows:
        if row is None:
            lines.append(_fixed_row(["", "x", "", "waytoolongsize", "", "", "j", "", "", "", "", "", ""]))
        else:
            loc, num, cases, size, price = row
            lines.append(_fixed_row([
                str(loc), str(num), "x", str(cases), size, "|", "COKE 12OZ",
                "z", f"{price:.2f}", "0.10", f"{price*0.95:.2f}", "1.00",
                f"{price*cases:.2f}",
            ]))
    payload = "\n".join(lines)
    tp = _tp(tmp_path_factory.mktemp("fx"), [("c", 0, "fixedwidth_table", payload)])
    got = duckdb.sql(entry._fixedwidth_sql(tp)).fetchdf().sort_values("item_no")
    exp = _records("fixedwidth_table", payload)
    assert len(got) == len(exp)
    for r, rec in zip(got.itertuples(index=False), exp):
        assert (r.loc, r.num, r.cases, r.price, r.total) == (
            rec["loc"], rec["num"], rec["cases"], rec["price"], rec["total"]
        )
        assert bool(r.is_header) == rec["is_header"]


_SENT = st.sampled_from([
    "The quarterly filing shows a material increase in throughput.",
    "Arrow batches move columnar data between workers.",
    "tiny",  # under MIN_BLOCK_CHARS
    "Total amount without VAT 475,00 NOK",
])


@settings(max_examples=25, deadline=None)
@given(
    st.booleans(),  # nav present
    st.booleans(),  # cookie banner present
    st.booleans(),  # main wrapper present (else blocks live in body)
    st.lists(_SENT, min_size=1, max_size=4),
    st.booleans(),  # anchor-dense paragraph
)
def test_html_oracle_matches_extractor(tmp_path_factory, nav, cookie, main, sents, anchors):
    parts = ["<html><head><script>var t=1;</script></head><body>"]
    if nav:
        parts.append('<nav><a href="/a">A</a> <a href="/b">B</a></nav>')
    if cookie:
        parts.append('<header><div class="cookie-banner">We use cookies. <a href="#">OK</a></div></header>')
    body = "".join(f"<p>{s}</p>" for s in sents)
    if anchors:
        body += '<p><a href="#">x</a><a href="#">y</a> ok</p>'  # link-dense
    if main:
        parts.append(f"<main><article>{body}</article></main>")
    else:
        parts.append(body)
    parts.append("<footer>© corp <a href='#'>z</a></footer></body></html>")
    payload = "".join(parts)
    tp = _tp(tmp_path_factory.mktemp("ht"), [("c", 0, "html_page", payload)])
    got = duckdb.sql(entry._html_main_sql(tp)).fetchdf().iloc[0]["main_text"]
    exp = dispatch.extract_one("html_page", payload)["extracted_text"]
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(
    st.tuples(
        st.sampled_from([(117, "Ar", 3), (131, "He", 2), (187, "Ar", 4), (159, "Ox", 1)]),
        st.sampled_from(
            ["public farmer", "priest of Soknebtynis", "weaver", "donkey driver"]
        ),
        st.sampled_from(["Harthotes", "Didymos", "Aurelius Sarapion"]),  # declarant
        st.integers(0, 4),                      # family members (0 → J6 insertion)
        st.booleans(),                          # member 1 name == declarant (d1 id)
        st.lists(st.booleans(), min_size=0, max_size=3),  # wife suffix per member 2..n
        st.booleans(),                          # non-kin section
        st.booleans(),                          # slaves section
        st.booleans(),                          # wrapped continuation line
        st.booleans(),                          # boilerplate inside the member section
    )
)
def test_census_persons_oracle_matches_extractor(tmp_path_factory, cfg):
    """Stage-B persons oracle vs the extractor on randomized households
    within the fixture grammar: declarant-name id match (d1 vs FM shift),
    wife→[no. 1] spouse resolution both directions (last wife wins),
    J6 declarant insertion on an empty family list, the 187-Ar-4 non-kin
    drop / empty-family quarantine, continuation + boilerplate merging."""
    (year, loc, order), occ, declarant, n_fam, m1_is_dec, wives, nonkin, slaves, \
        wrapped, boiler = cfg
    declarant = declarant.split(" ")[0]
    m1 = declarant if m1_is_dec else "Tapekysis"
    lines = [
        "Catalogue of census declarations",
        "312",
        f"HOUSEHOLD NO.: {year}-{loc}-{order}",
        "Source: P.Mich. 123 (4)",
        f"Prov., Date: Tebtynis (Arsinoite), {year}",
        f"Declarant: {declarant} s. Petesouchos, {occ}, 45",
        "Family members:",
    ]
    for i in range(1, n_fam + 1):
        if i == 1:
            lines.append(f"(1) {m1} [declarant] s. Petesouchos and Isidora, {occ}, 45")
        else:
            entry_line = f"({i}) Soeris d. {declarant} and Taues, 2{i}"
            if i - 2 < len(wives) and wives[i - 2]:
                entry_line += f", wife of {declarant} [no. 1]"
            lines.append(entry_line)
        if wrapped and i == 1:
            lines.append("wrapped continuation of the entry text")
        if boiler and i == 1:
            lines.append("Cambridge Books Online © 2010")
    if nonkin:
        lines.append("Free non-kin:")
        lines.append("(1) Horos s. Taues, 30")
    if slaves:
        lines.append("Slaves:")
        lines.append("(1) Thenatymis female slave of Harthotes, 20")
    lines.append("Verif./photo: BL")
    lines.append("Discussion: Register.")
    payload = "\n".join(lines)
    tp = _tp(tmp_path_factory.mktemp("cp"), [("c", 0, "census_page", payload)])
    got = duckdb.sql(entry._persons_sql(tp)).fetchdf().sort_values("person_no")
    recs = dispatch.extract_one("census_page", payload)["records"]
    exp = recs[0]["persons"] if recs else []  # [] = quarantined crash
    assert len(got) == len(exp)
    for row, p in zip(got.itertuples(index=False), exp):
        assert row.household_id == p["household_id"]
        assert row.person_id == p["id"]
        assert row.name == p["name"]
        assert (None if pd.isna(row.sex) else row.sex) == p["sex"]
        assert row.age == p["age"]
        assert (None if pd.isna(row.occupation) else row.occupation) == p["occupation"]
        assert (None if pd.isna(row.father) else row.father) == p["father"]
        assert (None if pd.isna(row.mother) else row.mother) == p["mother"]
        assert (None if pd.isna(row.spouse) else row.spouse) == p["spouse"]
        assert row.siblings == ";".join(p["siblings"] or [])
        assert row.children == ";".join(p["children"] or [])
        assert (None if pd.isna(row.relation_to_declarant) else row.relation_to_declarant) \
            == p["relation_to_declarant"]
        assert row.role == p["role"]
        assert (None if pd.isna(row.owner) else row.owner) == p["owner"]


def test_extracted_text_oracle_matches_extractor_all_families(tmp_path):
    """Per-turn extracted_text equality (the north rule's deliverable)
    for every family at once, on adversarial payloads: marker-less
    catalog page, stop-prefix lines, boilerplate inside census sections,
    non-Arial and left-of-header coord spans, tab-bearing ruled rows,
    malformed form widget lines, and an html page whose main is empty."""
    payloads = [
        ("c0", 0, "invoice_ocr", "Invoice 123 Invoice Date: 01.02.2024\nOrder No.: 555 Loading date 02.02.2024"),
        ("c0", 1, "catalog_page", "no marker here\njust noise"),  # -> ''
        ("c0", 2, "catalog_page", "\n".join([
            "preamble", _MARKER, "MANUFACTURER-MODEL-ENGINE", "Oil",
            "TOYOTA", "2021", "Camry", "V6-3.5L", "M1-111A",
            "Premium Filter Recommended. tail",  # stop prefix dropped
            "  Recommended. padded",             # stripped before the check
        ])),
        ("c0", 3, "census_page", "\n".join([
            "Catalogue of census declarations", "312",
            "HOUSEHOLD NO.: 117-Ar-3", "Source: P.Mich. 1 (2)",
            "Prov., Date: Tebtynis (Arsinoite), 117",
            "Declarant: Harthotes s. Petesouchos, weaver, 45",
            "Family members:", "(1) Didymos [declarant] s. A and B, weaver, 30",
            "Cambridge Books Online © 2010", "", "wrapped tail",
            "Verif./photo: BL", "Discussion: Register.",
        ])),
        ("c0", 4, "coord_table", "\n".join([
            "10.0|5.0|Arial,Bold|State Code", "80.0|5.0|Arial,Bold|County Code",
            "", "9.0|9.0|Arial|left-of-header", "85.0|9.0|Arial|042",
            "99.0|9.0|Times|dropped-font", "", "85.0|11.0|Arial|043",
        ])),
        ("c0", 5, "ruled_table", "h1│h2\ta\nr1│r2\n\nr3│r4"),
        ("c0", 6, "fixedwidth_table", "A" * 80 + "\n\n" + "B" * 80),
        ("c0", 7, "form_page", "a|Yes|1\nbad-line\nb|x|notint\nc|v|0"),
        ("c0", 8, "html_page", "<html><body><nav>Nav</nav><main></main>"
         "<div>Long enough body text outside main to be dropped.</div></body></html>"),
    ]
    tp = _tp(tmp_path, payloads)
    got = duckdb.sql(entry._extracted_text_sql(tp)).fetchdf()
    got = {(r.conv_id, r.turn_idx): r.extracted_text for r in got.itertuples(index=False)}
    assert len(got) == len(payloads)
    for conv, turn, kind, text in payloads:
        exp = dispatch.extract_one(kind, text)["extracted_text"]
        assert got[(conv, turn)] == exp, (kind, turn, got[(conv, turn)], exp)
