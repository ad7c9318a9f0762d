"""Deterministic synthetic payload synthesis, one function per family.

Every payload is a pure function of ``(conv_id, turn_idx)`` via a stable
md5-seeded ``random.Random`` — identical output regardless of partitioning,
process, or PYTHONHASHSEED (FIXTURES.md §2; SURVEY.md §7 hard part
"deterministic ID generation"). No external data.

Payload families mirror the reference corpora:

* ``invoice_ocr``      — nordic-logistics OCR text  (nordic-invoice.py)
* ``census_page``      — roman-census line stream   (household.py / persons.py)
* ``catalog_page``     — mobil-oil hierarchical line stream (mobil-oil-extractor.py)
* ``coord_table``      — ffiec span records          (ffiec-census.py)
* ``ruled_table``      — isobic/knr grid tables      (isobic_pdf_to_csv.py, knr_property.py)
* ``fixedwidth_table`` — mancini line items          (invoice.py)
* ``html_page``        — embedded HTML w/ boilerplate (north-rule main-content)
"""

from __future__ import annotations

import hashlib
import random

# bump when FAMILIES or any generator changes — cache paths embed it so
# stale /tmp fixtures are never reused across versions
FIXTURE_VERSION = 2

FAMILIES = (
    "invoice_ocr",
    "census_page",
    "catalog_page",
    "coord_table",
    "ruled_table",
    "fixedwidth_table",
    "html_page",
    "form_page",
)


def _rng(conv_id: str, turn_idx: int) -> random.Random:
    seed = int.from_bytes(
        hashlib.md5(f"{conv_id}:{turn_idx}".encode()).digest()[:8], "big"
    )
    return random.Random(seed)


def family_for(conv_id: str, turn_idx: int) -> str:
    h = int.from_bytes(
        hashlib.md5(f"fam:{conv_id}:{turn_idx}".encode()).digest()[:4], "big"
    )
    return FAMILIES[h % len(FAMILIES)]


# ---------------------------------------------------------------- invoice_ocr

_PORTS = ["CNNBG", "NOMSS", "SEGOT", "DEHAM", "NLRTM", "DKAAR", "FIHEL"]
_VESSELS = ["AL ZUBARA - 0017W", "MAERSK EDI - 0042E", "NORDIC VIKING - 11", "OOCL ATLAS - 203S"]


def _date(rng: random.Random) -> str:
    return f"{rng.randint(1, 28):02d}.{rng.randint(1, 12):02d}.{rng.randint(2020, 2024)}"


def gen_invoice_ocr(rng: random.Random) -> str:
    inv = rng.randint(3000000, 3999999)
    lines = [
        f"Invoice {inv}   Invoice Date: {_date(rng)}   Due Date: {_date(rng)}",
        f"Customer Number: {rng.randint(1000, 9999)}",
        "Nordic Logistics AS - Freight services",
    ]
    n_items = rng.randint(1, 4)
    for _ in range(n_items):
        seg = [
            f"Order No.: {rng.randint(700000, 799999)}  Ext. order no. : KO{rng.randint(2100000, 2199999)}-{rng.randint(1, 9)}",
            f"Loading date {_date(rng)}"
            + (f"  Delivery date {_date(rng)}" if rng.random() > 0.3 else ""),
            f"Vessel Name: {rng.choice(_VESSELS)} Container type: {rng.choice(['40DC', '20DC', '40HC'])}",
            f"Port of loading: {rng.choice(_PORTS)}   Port of delivery: {rng.choice(_PORTS)}",
            f"Total amount without VAT {rng.randint(1, 99)} {rng.randint(100, 999)},{rng.randint(0, 99):02d} NOK   Tour No.: {rng.randint(300000, 399999)}",
        ]
        lines.extend(seg)
    return "\n".join(lines)


# ---------------------------------------------------------------- census_page

_NAMES = [
    "Harthotes", "Thenatymis", "Taorsenouphis", "Petesouchos", "Aurelius Sarapion",
    "Tapekysis", "Pnepheros", "Thermoutharion", "Didymos", "Isidora", "Herakles",
    "Sambathion", "Taues", "Horos", "Soeris", "Panetbeuis", "Tephorsais",
]
_OCCUPATIONS = ["public farmer", "priest of Soknebtynis", "weaver", "fisherman", "donkey driver"]
_PLACES = ["Theadelphia (Arsinoite)", "Tebtynis (Arsinoite)", "Oxyrhynchos", "Ankyronpolis (Herakleopolite)"]
_BOILER = [
    "Cambridge Books Online © Cambridge University Press, 2010",
    "https://doi.org/10.1017/CBO9780511552922",
    "Catalogue of census declarations 312",
]


def gen_census_page(rng: random.Random) -> str:
    year = rng.choice([11, 117, 131, 159, 173, 187])
    loc = rng.choice(["Ar", "He", "Ox", "Pr"])
    order = rng.randint(1, 9)
    declarant = rng.choice(_NAMES).split(" ")[0]
    father = rng.choice(_NAMES).split(" ")[0]
    occupation = rng.choice(_OCCUPATIONS)
    lines = [
        "Catalogue of census declarations",  # page header (skipped: lines[2:])
        f"{rng.randint(100, 400)}",
        f"HOUSEHOLD NO.: {year}-{loc}-{order}",
        f"Source: P.Mich. {rng.randint(100, 999)} ({rng.randint(1, 99)})",
        f"Prov., Date: {rng.choice(_PLACES)}, {year}",
        f"Declarant: {declarant} s. {father}, {occupation}, {rng.randint(20, 70)}",
    ]
    n_fam = rng.randint(1, 4)
    lines.append("Family members:")
    for i in range(1, n_fam + 1):
        nm = rng.choice(_NAMES).split(" ")[0]
        if i == 1:
            entry = f"(1) {nm} [declarant] s. {father} and {rng.choice(_NAMES).split(' ')[0]}, {occupation}, {rng.randint(20, 70)}"
        else:
            rel = rng.choice(["s.", "d."])
            entry = f"({i}) {nm} {rel} {declarant} and {rng.choice(_NAMES).split(' ')[0]}, {rng.randint(1, 60)}"
            if rng.random() < 0.3:
                entry += f", wife of {declarant} [no. 1]"
        lines.append(entry)
        if rng.random() < 0.25:
            lines.append("wrapped continuation of the entry text")
        if rng.random() < 0.3:
            lines.append(rng.choice(_BOILER))
    if rng.random() < 0.5:
        lines.append("Free non-kin:")
        lines.append(f"(1) {rng.choice(_NAMES).split(' ')[0]} s. {rng.choice(_NAMES).split(' ')[0]}, {rng.randint(10, 60)}")
    if rng.random() < 0.4:
        lines.append("Slaves:")
        lines.append(f"(1) {rng.choice(_NAMES).split(' ')[0]} female slave of {declarant}, {rng.randint(10, 50)}")
    lines.append(f"Verif./photo: {rng.choice(['BL', 'photo', 'P.Mich. inv.'])}")
    disc = "Household register. "
    if rng.random() < 0.4:
        disc += "Broken at top. "
    lines.append(f"Discussion: {disc.strip()}")
    return "\n".join(lines)


# --------------------------------------------------------------- catalog_page

_MANUF = ["ACURA", "BUICK", "CADILLAC", "CHEVROLET TRUCKS", "DODGE", "SAAB", "TOYOTA", "VOLVO"]
_MODELS = ["MDX", "Enclave", "Escalade", "Silverado", "Ram 1500", "9-3", "Camry", "XC90"]
_ENGINES = ["V6-3.5L", "V8-6.2L", "L4-2.0L Turbo", "V6-3.6L", "L4-2.5L"]
_HEADER_BLOCK = [
    "FILTERS FOR PASSENGER CARS AND LIGHT TRUCKS/ FILTRES POUR VOITURES PARTICULIERES ET",
    "VEHICULES UTILITAIRES LEGERS/ FILTROS PARA AUTOMOVILES Y CAMIONES LIGEROS",
    "MANUFACTURER-MODEL-ENGINE",
    "Oil",
]


def gen_catalog_page(rng: random.Random) -> str:
    lines = [
        "page preamble noise to trim",  # F4: dropped before the marker line
        "more preamble",
    ]
    lines.extend(_HEADER_BLOCK)
    for _ in range(rng.randint(1, 3)):
        lines.append(rng.choice(_MANUF))
        lines.append(str(rng.randint(2015, 2024)))
        for _ in range(rng.randint(1, 2)):
            lines.append(rng.choice(_MODELS))
            lines.append(rng.choice(_ENGINES))
            oils = [f"M1-{rng.randint(100, 999)}A" for _ in range(rng.randint(1, 3))]
            lines.append(" ".join(oils))
            if rng.random() < 0.3:
                lines.append("Voir las page 2 pour une explication des renvois en bas de la page.")
    return "\n".join(lines)


# ---------------------------------------------------------------- coord_table

_FFIEC_COLS = [
    (30.0, "State Code"),
    (90.0, "County Code"),
    (150.0, "Tract Code"),
    (230.0, "Tract Income Level"),
    (330.0, "Distressed or Under-served Tract"),
    (430.0, "Tract Median Family Income %"),
]


def gen_coord_table(rng: random.Random) -> str:
    lines = []
    y = 40.0
    for x, name in _FFIEC_COLS:
        lines.append(f"{x:.1f}|{y:.1f}|Arial,Bold|{name}")
    lines.append("")  # block separator
    for _ in range(rng.randint(2, 8)):
        y += 12.0
        row = [
            (30.0, f"{rng.randint(6, 48):02d}"),
            (90.0, f"{rng.randint(1, 115):03d}"),
            (150.0, f"{rng.randint(1, 9999):04d}.{rng.randint(0, 99):02d}"),
            (230.0, rng.choice(["Low", "Moderate", "Middle", "Upper"])),
            (330.0, rng.choice(["Yes", "No"])),
            (430.0, f"{rng.uniform(20, 200):.2f}"),
        ]
        if rng.random() < 0.2:
            row = [c for c in row if c[0] != 90.0]  # row without County Code → dropped (F6)
        for x, text in row:
            jitter = rng.uniform(0, 8)
            lines.append(f"{x + jitter:.1f}|{y:.1f}|Arial|{text}")
        if rng.random() < 0.2:
            lines.append(f"{rng.uniform(30, 400):.1f}|{y:.1f}|Arial,Bold|Section heading noise")
        lines.append("")
    return "\n".join(lines)


# ---------------------------------------------------------------- ruled_table

_KNR_HEADER = ["Date", "Payee / Payer", "Type", "Reference", "Description", "Income", "Expense", "Balance"]


def gen_ruled_table(rng: random.Random) -> str:
    rows = ["│".join(_KNR_HEADER)]
    balance = rng.uniform(1000, 9999)
    for _ in range(rng.randint(2, 10)):
        inc = rng.uniform(0, 2000)
        exp = rng.uniform(0, 800)
        balance += inc - exp
        cells = [
            f"{rng.randint(1, 12):02d}/{rng.randint(1, 28):02d}/{rng.randint(2021, 2024)}",
            rng.choice(["Acme\rCorp", "Jane Tenant", "City\tUtilities", "KNR Mgmt"]),
            rng.choice(["Payment", "Invoice", "Credit"]),
            f"REF-{rng.randint(1000, 9999)}",
            rng.choice(["Rent", "Repairs", "Deposit", "Management fee"]),
            f"{inc:,.2f}",
            f"{exp:,.2f}",
            f"{balance:,.2f}",
        ]
        rows.append("│".join(cells))
    if rng.random() < 0.5:
        # merged Total row (knr_property.py:50-55 repair case)
        total_inc = rng.uniform(1000, 9999)
        total_exp = rng.uniform(100, 999)
        rows.append("│".join([f"Total {total_inc:,.2f} {total_exp:,.2f}", "", "", "", "", "", "", ""]))
    return "\n".join(rows)


# ----------------------------------------------------------- fixedwidth_table

# Column boundaries in characters, proportional to the reference's 14
# explicit vertical line positions (invoice.py:42) → 13 columns.
FIXED_BOUNDS = [0, 5, 11, 13, 16, 22, 28, 50, 62, 69, 75, 81, 95, 105]
_DESCS = ["COKE 12OZ CAN", "SPRITE 2L BTL", "WATER 16OZ", "ORANGE JUICE", "ROOT BEER 12OZ"]
# junk columns sit at indices 2, 5, 7 — exactly the reference's drop list
# (invoice.py:138), so F8 removes them and 10 real columns remain.
_HEADER_CELLS = ["LOC", "NUM", "X", "CS", "SIZE", "Y", "DESCRIPTION", "Z", "PRICE", "DISC", "PRICE2", "DEPOSIT TOTAL", "TOTAL"]


def _fixed_row(cells: list[str]) -> str:
    out = []
    for i, cell in enumerate(cells):
        width = FIXED_BOUNDS[i + 1] - FIXED_BOUNDS[i]
        out.append(cell[: width - 1].ljust(width))
    return "".join(out).rstrip()


def gen_fixedwidth_table(rng: random.Random) -> str:
    lines = [_fixed_row(_HEADER_CELLS)]
    for _ in range(rng.randint(2, 8)):
        price = rng.uniform(5, 99)
        cases = rng.randint(1, 80)
        cells = [
            str(rng.randint(1, 999)),
            str(rng.randint(10000, 99999)),
            "x",
            str(cases),
            rng.choice(["12/12", "24/16", "6/2L"]),
            "|",
            rng.choice(_DESCS),
            "z",
            f"{price:.2f}",
            f"{rng.uniform(0, 5):.2f}",
            f"{price * 0.95:.2f}",
            f"{rng.uniform(0, 9):.2f}",
            f"{price * cases:.2f}",
        ]
        lines.append(_fixed_row(cells))
        if rng.random() < 0.25:
            # junk row that fails the length predicates (invoice.py:141-143)
            lines.append(_fixed_row(["", "x", "", "toolongsize", "", "", "junk", "", "", "", "", "", ""]))
    return "\n".join(lines)


# ------------------------------------------------------------------ html_page

_NAV_ITEMS = ["Home", "Products", "Pricing", "About us", "Careers", "Contact", "Blog", "Support"]
_SENTENCES = [
    "The quarterly filing shows a material increase in logistics throughput.",
    "Extraction pipelines must preserve reading order across page boundaries.",
    "The census of Roman Egypt recorded households, declarants and slaves.",
    "Invoice reconciliation depends on stable order numbers and tour codes.",
    "Oil filter compatibility varies by manufacturer, model year and engine.",
    "A distributed scan prunes partitions before touching row payloads.",
    "Arrow batches move columnar data between the JVM and Python workers.",
]


def gen_html_page(rng: random.Random) -> str:
    nav = "".join(f'<a href="/{w.lower().replace(" ", "-")}">{w}</a> ' for w in rng.sample(_NAV_ITEMS, 5))
    paras = []
    for _ in range(rng.randint(2, 5)):
        n = rng.randint(2, 5)
        paras.append("<p>" + " ".join(rng.choice(_SENTENCES) for _ in range(n)) + "</p>")
    body = "\n".join(paras)
    footer_links = "".join(f'<a href="#">{w}</a>' for w in rng.sample(_NAV_ITEMS, 4))
    amount = f"{rng.randint(1, 999)},{rng.randint(0, 99):02d} NOK"
    date = _date(rng)
    return (
        "<html><head><title>Doc</title><style>p{margin:0}</style>"
        "<script>var t=1;</script></head><body>"
        f"<nav>{nav}</nav>"
        '<header><div class="cookie-banner">We use cookies. <a href="#">Accept</a> <a href="#">Reject</a></div></header>'
        f"<main><article><h1>Report {rng.randint(100, 999)}</h1>\n{body}\n"
        f"<p>Total amount without VAT {amount}   Delivery date {date}</p></article></main>"
        f"<aside>{footer_links}</aside>"
        f"<footer>© 2024 Example Corp {footer_links}</footer>"
        "</body></html>"
    )


# ------------------------------------------------------------------ form_page

_FORM_FIELDS = [
    ("consent_done", "checkbox"),
    ("code_text", "textbox"),
    ("grp_a", "checkbox"),
    ("grp_b", "checkbox"),
    ("grp_c", "checkbox"),
    ("int_sports", "checkbox"),
    ("int_music", "checkbox"),
    ("int_art", "checkbox"),
]


def gen_form_page(rng: random.Random) -> str:
    """Serialized AcroForm widgets, one per line: name|value|type_code
    (playground/pdf.py:7-27 field model)."""
    lines = []
    group = rng.choice(["grp_a", "grp_b", "grp_c"])
    for name, ftype in _FORM_FIELDS:
        if ftype == "textbox":
            value = f"{rng.choice('ABCDEFG')}{rng.choice('HIJKLMN')}{rng.randint(10, 99)}"
            code = 0
        else:
            if name.startswith("grp_"):
                value = "Yes" if name == group else "Off"
            else:
                value = rng.choice(["Yes", "Off"])
            code = 1
        lines.append(f"{name}|{value}|{code}")
    if rng.random() < 0.3:
        lines.append(f"extra_button||5")
    return "\n".join(lines)


_GENERATORS = {
    "invoice_ocr": gen_invoice_ocr,
    "census_page": gen_census_page,
    "catalog_page": gen_catalog_page,
    "coord_table": gen_coord_table,
    "ruled_table": gen_ruled_table,
    "fixedwidth_table": gen_fixedwidth_table,
    "html_page": gen_html_page,
    "form_page": gen_form_page,
}


def payload_for(conv_id: str, turn_idx: int, family: str | None = None) -> tuple[str, str]:
    """Return (family, payload) for a turn — pure function of the key."""
    fam = family or family_for(conv_id, turn_idx)
    return fam, _GENERATORS[fam](_rng(conv_id, turn_idx))
