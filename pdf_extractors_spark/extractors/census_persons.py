"""Roman-census persons extraction + entity resolution (stage B).

Re-expresses ``roman-census/persons.py``:

* name extraction cascade X4 (persons.py:8-43), leading-"(N)" strip X5
  (persons.py:45-47), sex classifier X6 (persons.py:50-101), age extractor
  X7 (persons.py:104-128), role/type maps X8 (persons.py:130-150),
  occupation dictionary X9 — the persons.py variant (persons.py:153-176),
* kinship extractors X10: parents/father/mother/grandfathers/spouses/
  siblings/slave-mother/owner (persons.py:180-345),
* relation-to-declarant classifier X11 (persons.py:286-317),
* numbered-entry predicate F9 (persons.py:320-327),
* entity resolution J1-J7: name-match id assignment (persons.py:389-411),
  number-reference join (persons.py:691-728), relation-kind cascade
  (persons.py:542-633), bidirectional graph update (persons.py:437-476),
  declarant-centric pass (persons.py:479-512), declarant insertion
  (persons.py:731-769), resolved-ref cleanup (persons.py:648-666, 514-518).

All resolution runs within one household (≤ ~30 persons), inside the
per-document Arrow batch — the classic "small-group stateful op stays in
the UDF" pattern (SURVEY.md §2.5 J1). The mutation order is the reference's
sequential order, which is deterministic given the household's member lists,
so output is identical under any partitioning.
"""

from __future__ import annotations

import functools
import re
import warnings

# --------------------------------------------------------------------- X4/X5

_NAME_PATTERN = re.compile(r"^\s*[\(\d+\)]*\s*(.*?)(?=\s*,\s*)", re.IGNORECASE)
_REL_PATTERN = re.compile(
    r"(\?d\.|\?s\.|s\.|d\.|mother of|ss\.|son of| daughter of|brother of|father of|slave of|child of|wife of|child of|female|male|wife|freed|offspring of)",
    re.IGNORECASE,
)
# NOTE: the reference uses character classes as if they were alternations
# (persons.py:11) — preserved bug-for-bug (SURVEY.md §7 "exact regex parity").
_NAME_PATTERN1 = re.compile(
    r"^\s*[\(\d+\)]*\s*(.*?)(?=\s+[\?d\.|\?s\.|s\.|d\.|mother of|ss\.|son of| daughter of|brother of|father of|slave of|child of|wife of|male|female|wife|freed|offspring of]+)"
)
_NAME_PATTERN2 = re.compile(
    r"^\s*[\(\d+\)]*\s*(.*)(?=\s*\W\s*(\?d\.|\?s\.|s\.|d\.|mother of|ss\.|son of| daughter of|brother of|father of|slave of|child of|wife of|male|female|wife|freed|offspring of))",
    re.IGNORECASE,
)
_DECLARANT_SCRUB = re.compile(r"(\[declarant]| \[declarant\] |(\[declarant) |\[declarant)")
_RE_START_NUM = re.compile(r"^\s*\(\d+\)\s*")


def get_name(data) -> str | None:
    """X4 (persons.py:8-43)."""
    if not isinstance(data, str):
        return ""
    m = _NAME_PATTERN.search(data)
    if not m:
        return None
    name = m.group(1).strip()
    if _REL_PATTERN.search(name) is not None:
        found = _NAME_PATTERN1.search(data)
        if found:
            name = found.group(1).strip()
            if len(name) == 0:
                found = _NAME_PATTERN2.search(data)
                if found:
                    name = found.group(1).strip()
        else:
            found = _NAME_PATTERN2.search(data)
            if found:
                name = found.group(1).strip()
    name = _DECLARANT_SCRUB.sub(" ", name)
    name = name.replace("(s.", "").replace("(d.", "")
    return name.strip()


def remove_starting_number(data: str) -> str:
    """X5 (persons.py:45-47)."""
    return _RE_START_NUM.sub("", data)


# ------------------------------------------------------------------------ X6

def get_sex(data: str, type_: str) -> str | None:
    """X6 (persons.py:50-101)."""
    data = remove_starting_number(data)
    if "s. (or d.?)" in data:
        return "male or female"
    sex = None
    for part in data.split(" "):
        if type_ in ("F", "K"):
            if part == "s./d.":
                return "male or female"
            if (
                part in ("d.", "?d.", "(d.", "daughter", "wife", "sister", "freedw.")
                or "mother" in part
                or "female" in part
            ):
                if sex is None:
                    sex = "female"
                    if "?" in part:
                        sex = "possible " + sex
                else:
                    sex = sex + "or female"
                break
            if (
                part in ("s.", "?s.", "s.?", "son", "(s.", "brother")
                or "father" in part
                or "male" in part
            ):
                sex = "male"
                if "?" in part:
                    sex = "possible " + sex
                break
        elif type_ == "S":
            if "female" in part:
                return "female"
            if "male" in part:
                return "male"
    return sex


# ------------------------------------------------------------------------ X7

_RE_AGE = re.compile(r"(?<=;\s|,\s)([\[\.\]]*\d+.*)", re.IGNORECASE)
_RE_PROBABLY = re.compile(r"(\(probably\s+.*)|(probably\s+.*)|\?.*probable.*", re.IGNORECASE)


def get_age(data: str) -> str:
    """X7 (persons.py:104-128), incl. the '2nd certain)' quirk."""
    age = ""
    data = remove_starting_number(data)
    if "age lost" in data:
        age = "age lost"
    if "age not given" in data:
        age = "age not given"
    if not age:
        found = _RE_AGE.findall(data)
        if found:
            age = " or ".join(m.strip() for m in found)
            if age == "2nd certain)":
                m = _RE_PROBABLY.search(data)
                if m:
                    age = m.group(0).strip()
        else:
            m = _RE_PROBABLY.search(data)
            if m:
                age = m.group(0).strip()
    return age


# ------------------------------------------------------------------------ X8

_ROLES = {"F": "family member", "K": "free non-kin", "S": "slave"}
_TYPES = {"family member": "FM", "free non-kin": "NK", "slave": "S"}


def get_role(type_: str) -> str | None:
    return _ROLES.get(type_)


def get_type(role: str) -> str | None:
    return _TYPES.get(role)


# ------------------------------------------------------------------------ X9

# persons.py:154-160 variant (differs from household.py's: has scribe,
# doctor, stonecutter, tailor, cloth-beater; lacks donkey driver, goldsmith,
# spinner, salaried linen-weaver).
OCCUPATIONS = [
    "public farmer and priest", "public farmer", "farmer", "priest", "mason",
    "discharged solder", "workman", "idiotes", "former gym- nasiarch", "metallikos",
    "discharged veteran", "hyperetes", "hierotek- ton", "tax-exempt hieronikes",
    "nekrotaphos", "woolwasher", "linenweaver", "sitometrosakkophoros",
    "former exegetai", "member of the hiera synodos",
    "councillor", "taurotrophos", "fisherman", "weaver", "scribe", "doctor",
    "lathe turner", "stonecutter", "tailor", "cloth-beater",
]


def get_occupation(line: str | None) -> str:
    """X9 (persons.py:153-176)."""
    if line is None:
        return ""
    for occupation in OCCUPATIONS:
        if occupation in line:
            ret = occupation
            if "priest" in occupation:
                parts = line.split("priest of ")
                if len(parts) == 2:
                    ret += " of "
                    ret += parts[1].split(",")[0] if "," in parts[1] else parts[1]
            return ret
    return ""


# ----------------------------------------------------------------------- X10

_RE_FATHER_AND = re.compile(
    r"(?: s\. \(or d\.\?\) of | s\. \(\?\) of | s\.\/d\. | d\. \(\?\) of |\?d\.|\?s\.| s\.\? of | s\.|d\.|ss\.|son of| daughter of|father of|child of|born to)(.*?)(?:and)",
    re.IGNORECASE,
)
_RE_FATHER = re.compile(
    r"(?: s\. \(or d\.\?\) of | s\. \(\?\) of | d\. \(\?\) of |\?d\.|\?s\.| s\.\? of | s\.|d\.|ss\.|son of| daughter of|father of|child of|born to)([—\s+\w+.?[\]))]+)",
    re.IGNORECASE,
)
_RE_WORD = re.compile(r"\b(\w+)\b", re.IGNORECASE)
_RE_MOTHER = re.compile(r"(?:\D\s+and\s+)([—\s+\w+\(.?[\]))]+)", re.IGNORECASE)
_RE_PGF = re.compile(r"\(s\. ([\w+\s+.\[\]]+)\)", re.IGNORECASE)
_RE_MGF = re.compile(r"\(d\. ([\w+\s+.\[\]]+)\)", re.IGNORECASE)
_RE_HUSBAND = re.compile(r"(?<!divorced )(?<!deceased )(?:husband of )([\w\s.[\]]+)", re.IGNORECASE)
_RE_WIFE = re.compile(
    r"(?<!divorced )(?<!deceased )(?:wife of |wife and full sister of |wife and sister of )([\w\s.[\]]+)",
    re.IGNORECASE,
)
_RE_BROTHER = re.compile(r"(?:, |,)(?:brother of |br\. of|br\. )([\w\s.[\]]+)", re.IGNORECASE)
_RE_SISTER = re.compile(
    r"(?:, |,)(?:sister of |sister and former wife of |sister and wife of |sister and divorced wife of |sister )([\w\s.[\]']+)",
    re.IGNORECASE,
)
_RE_SLAVE_MOTHER = re.compile(r"(?:offspring of )(.*?),", re.IGNORECASE)
_RE_OWNER = re.compile(r"(?:slave[ \(\w\)]* of )(.*?),", re.IGNORECASE)


# every alternative of _RE_FATHER/_RE_FATHER_AND contains one of these
# literals (s. covers ss./?s./s.? forms; d. covers ?d.) — a miss on all
# of them makes the regex search a guaranteed miss, so it is skipped
_FATHER_GUARDS = (
    "s.", "d.", "son of", "daughter of", "father of", "child of", "born to"
)


def get_father(data: str) -> str | None:
    """X10 (persons.py:188-211)."""
    low = data.lower()
    if not any(g in low for g in _FATHER_GUARDS):
        return None
    pattern = _RE_FATHER_AND if " and " in data else _RE_FATHER
    m = pattern.search(data)
    father = m.group(1).strip() if m else None
    if father is not None:
        if "declarant" in father:
            father = ""
        else:
            w = _RE_WORD.search(father)
            father = w.group(1) if w else father
    return father


def get_mother(data: str) -> str | None:
    """X10 (persons.py:213-227). Guard: the pattern's mandatory
    ``\\s+and\\s+`` cannot match a line without "and"."""
    if "and" not in data.lower():
        return None
    m = _RE_MOTHER.search(data)
    mother = m.group(1).strip() if m else None
    if mother is not None and "wife" in mother:
        return None
    if mother is not None:
        mother = mother.split(" ")[0]
    return mother


def get_paternal_grand_father(data: str, household_id: str = "") -> str | None:
    """X10 (persons.py:230-242) — household-specific suppression kept."""
    if household_id == "117-Ar-2":
        return None
    # cheap guard: the pattern's literal "(s. " cannot match without it
    if "(s." not in data.lower():
        return None
    m = _RE_PGF.search(data)
    pgf = m.group(1).strip() if m else None
    if pgf is not None:
        pgf = pgf.split(" ")[0]
    return pgf


def get_maternal_grand_father(data: str, household_id: str = "") -> str | None:
    """X10 (persons.py:244-253)."""
    if household_id == "117-Ar-2":
        return None
    if "(d." not in data.lower():
        return None
    m = _RE_MGF.search(data)
    return m.group(1).strip() if m else None


def get_spouses(data: str) -> str | None:
    """X10 (persons.py:256-271). Cheap guards: every alternative of each
    pattern contains the guarded literal, so a miss is free."""
    low = data.lower()
    m = _RE_HUSBAND.search(data) if "husband" in low else None
    if m:
        return m.group(1).strip()
    m = _RE_WIFE.search(data) if "wife" in low else None
    if m:
        spouse = m.group(1).strip()
        if "s." in spouse:
            spouse = spouse.split(" ")[0]
        return spouse
    return None


def get_siblings(data: str) -> list[str]:
    """X10 (persons.py:274-283). Guards: 'br' / 'sister' appear in every
    alternative of the respective pattern."""
    low = data.lower()
    brothers = _RE_BROTHER.findall(data) if "br" in low else []
    sisters = _RE_SISTER.findall(data) if "sister" in low else []
    return [m.strip() for m in brothers + sisters]


def get_slave_mother(data: str) -> str | None:
    """X10 (persons.py:329-336)."""
    if "offspring" not in data.lower():
        return None
    m = _RE_SLAVE_MOTHER.search(data)
    return m.group(1).strip() if m else None


def get_owner(data: str) -> str | None:
    """X10 (persons.py:338-345)."""
    if "slave" not in data.lower():
        return None
    m = _RE_OWNER.search(data)
    return m.group(1).strip() if m else None


# ----------------------------------------------------------------------- X11

_REL_WORDS = (
    "perhaps wife and sister|probably wife |full sister and wife|wife and sister|"
    "sister and wife|sister and divorced wife|wife|sister|brother of the father|"
    "husband|brother|relative|son|daughter|child|mother"
)
_RE_RELATION = re.compile(
    r"(?:, |,|\()(" + _REL_WORDS + r")(?:[\s+\w+\s+]+)\[*declarant\]*\)*", re.IGNORECASE
)
_RE_RELATION1 = re.compile(
    r"(?:, |,|\()(" + _REL_WORDS + r")(?:[\s+\w+\s+]+).*\[*declarant\]*\)*", re.IGNORECASE
)
_RE_SON_DAUGHTER = re.compile(
    r"(s\. or gs\.|s\.\/d\.|s\.|d\.).*?(\[declarant\]|\[declarant,|\[of declarant\]*)",
    re.IGNORECASE,
)
_RE_SELF = re.compile(
    r"^(?!.*(?:s\.|d\.).*?\[declarant\]).*\[declarant\]|^(?!.*(?:s\.|d\.).*?\[declarant\]).*\(declarant\)",
    re.IGNORECASE,
)


def get_relation_to_declarant(data: str, household_id: str = "") -> str | None:
    """X11 (persons.py:286-317). Cheap guard first (SURVEY §4): every
    pattern in the cascade requires the literal 'declarant', so its
    absence short-circuits the whole battery."""
    if "declarant" not in data.lower():
        return None
    m = _RE_RELATION.search(data)
    if m:
        return m.group(1).lower()
    m = _RE_RELATION1.search(data)
    if m:
        return m.group(1).lower()
    m = _RE_SON_DAUGHTER.search(data)
    if m:
        value = m.group(1).lower()
        if value == "s. or gs.":
            return "self"
        if value == "s.":
            return "son"
        if value == "d.":
            return "daughter"
        if "s" in value and "d" in value:
            return "son or daughter"
        return None
    if _RE_SELF.search(data):
        return "self"
    return None


# ------------------------------------------------------------------------ F9

_RE_CONTAINS_MEMBER = re.compile(r"\(*\d+\)", re.IGNORECASE)


def contain_members(data: str) -> bool:
    return _RE_CONTAINS_MEMBER.search(data) is not None


# ----------------------------------------------------------------- parse (X*)

def parse_person(household_id: str, entries: list[str], type_: str) -> list[dict]:
    """persons.py:348-385."""
    members = []
    for data in entries:
        if not contain_members(data):
            continue
        member: dict = {
            "household_id": household_id,
            "name": get_name(data),
            "sex": get_sex(data, type_),
            "age": get_age(data),
        }
        if type_ in ("F", "K"):
            member.update(
                occupation=get_occupation(data),
                father=get_father(data),
                mother=get_mother(data),
                paternal_grandfather=get_paternal_grand_father(data, household_id),
                maternal_grandfather=get_maternal_grand_father(data, household_id),
                spouse=get_spouses(data),
                siblings=get_siblings(data),
                children=[],
                relation_to_declarant=get_relation_to_declarant(data),
                owner=None,
            )
        else:
            member.update(
                occupation=None,
                father=None,
                mother=get_slave_mother(data),
                paternal_grandfather=None,
                maternal_grandfather=None,
                spouse=None,
                siblings=[],
                children=[],
                relation_to_declarant=None,
                owner=get_owner(data),
            )
        member["role"] = get_role(type_)
        member["data"] = data
        members.append(member)
    return members


# ------------------------------------------------------------------------ J1

def set_personal_ids(household_id: str, declarant_ids: list[str], declarant_names: list[str], persons: list[dict]) -> None:
    """J1 name-match join + X14 sequential ids (persons.py:389-411),
    with the 'Aurelius'→'Aur.' normalization X22 (persons.py:396-403)."""
    id_index = 1
    # the strip/"Aurelius" normalizations are pure per-string transforms:
    # hoisted out of the person×declarant loop (value-identical, the
    # inner loop was recomputing both on every probe)
    dnames = [d.strip().replace("Aurelius", "Aur.") for d in declarant_names]
    for person in persons:
        if person.get("relation_to_declarant") == "self" and person.get("id") is None:
            pname = person["name"] or ""
            pcmp = pname.replace("Aurelius", "Aur.")
            for index, dname in enumerate(dnames):
                if (
                    pcmp.startswith(dname)
                    or dname.startswith(pcmp)
                    or dname in pcmp
                    or (person["name"] or "") in dname
                ):
                    if index < len(declarant_ids):
                        person["id"] = declarant_ids[index]
                    break
            if person.get("id") is None:
                person["id"] = f"{household_id}-{get_type(person['role'])}{id_index}"
                id_index += 1
        else:
            person["id"] = f"{household_id}-{get_type(person['role'])}{id_index}"
            id_index += 1


# --------------------------------------------------------------------- J2/J7

_RE_NOS_AND = re.compile(r"(?:nos\. )(\d\?* and \d\?*)", re.IGNORECASE)


@functools.lru_cache(maxsize=64)
def _number_pattern(ref_no: int) -> re.Pattern[str]:
    tok = f"{ref_no}|l" if ref_no == 1 else str(ref_no)
    return re.compile(
        r"\[*\s*nos*\.\s*({0})\s*\]\?*|\(*\s*nos*\.\s*({0})\s*\)\?*|no\.({0}\?*)".format(tok),
        re.IGNORECASE,
    )


def find_number_reference(ref_no: int, persons: list[dict]) -> list:
    """J2 (persons.py:691-728) incl. the OCR l≡1 tolerance."""
    indexes: list = []
    pat = _number_pattern(ref_no)
    for index, person in enumerate(persons):
        # cheap guard: every reference pattern requires 'no' ('no.'/'nos.')
        if "no" not in person["data"].lower():
            continue
        m = _RE_NOS_AND.search(person["data"])
        if m:
            for val in m.group(1).strip().split(" and "):
                if str(ref_no) == val:
                    indexes.append(index + 1)
        else:
            m = pat.search(person["data"])
            if m:
                value = m.group(1) or m.group(2) or m.group(3)
                if value.startswith("l"):
                    value = "1"
                if value == str(ref_no):
                    out = index + 1
                    if "?" in m.group(0):
                        indexes.append(f"{out}?")
                    else:
                        indexes.append(out)
    return indexes


_RE_REMOVE_NOS_AND = re.compile(r"(?:nos\. )(\d and \d)", re.IGNORECASE)
_RE_REMOVE_NUM = re.compile(r"(nos\. [\d|l]|\[no\. *[\d|l]\?*\])", re.IGNORECASE)


def remove_reference_num_entry(referenced_person: dict, referenced_by: dict, referenced_index: int, key: str) -> None:
    """J7 (persons.py:648-666)."""
    number_and = _RE_REMOVE_NOS_AND
    number = _RE_REMOVE_NUM
    # bug-for-bug (persons.py:648-666): the reference iterates the LIVE
    # list while removing — the element following each removal is skipped
    # — and an item matching the number pattern twice calls remove twice
    # (the second raises ValueError, which our per-row quarantine absorbs
    # where the reference would crash the whole run)
    for item in referenced_by[key]:
        m = number_and.search(item)
        if m:
            if str(referenced_index) in m.group(1).strip().split(" and "):
                referenced_by[key].remove(item)
        else:
            for match in number.findall(item):
                value = match.strip()
                if referenced_index == 1:
                    if "1" in value or "l" in value:
                        referenced_by[key].remove(item)
                elif str(referenced_index) in value:
                    referenced_by[key].remove(item)


def remove_declarant_entry(persons: list[dict], key: str) -> None:
    """J7 (persons.py:514-518). Bug-for-bug: the reference iterates the
    LIVE list while removing, so the element after each removed entry is
    skipped — two consecutive '[declarant]' items leave the second."""
    for person in persons:
        for item in person[key]:
            if "declarant" in item:
                person[key].remove(item)


# ------------------------------------------------------------------------ J4

def filter_siblings(existing: list[str], sibling_ids: list[str]) -> None:
    """persons.py:432-435."""
    for ex in existing:
        if ex in sibling_ids:
            sibling_ids.remove(ex)


def update_ids(person: dict, related: list[dict], relationship: str, question_mark: bool = False) -> None:
    """J4 bidirectional graph update (persons.py:437-476)."""
    related_id = related[0]["id"]
    person_id = person["id"]
    if question_mark:
        related_id += "?"
        person_id += "?"
    if relationship == "father":
        person["father"] = related_id
        related[0]["children"].append(person_id)
    if relationship == "mother":
        person["mother"] = related_id
        related[0]["children"].append(person_id)
    if relationship == "spouse":
        person["spouse"] = related_id
        related[0]["spouse"] = person_id
    if relationship == "siblings":
        sibling_ids = [p["id"] for p in related]
        filter_siblings(person["siblings"], sibling_ids)
        if question_mark:
            sibling_ids = [s + "?" for s in sibling_ids]
        person["siblings"].extend(sibling_ids)
        for sib in related:
            sib["siblings"].append(person_id)
    if relationship == "children":
        for child in related:
            child_id = child["id"] + ("?" if question_mark else "")
            person["children"].append(child_id)
            if person["sex"] == "male":
                child["father"] = person_id
            elif person["sex"] == "female":
                child["mother"] = person_id
            elif person["sex"] is None:  # assumed father (persons.py:475)
                child["father"] = person_id


# ------------------------------------------------------------------------ J5

def find_person(relation: str, persons: list[dict]) -> list[dict]:
    """persons.py:414-421 (containment match)."""
    return [
        p
        for p in persons
        if p.get("relation_to_declarant") and relation in p["relation_to_declarant"]
    ]


def set_relationship_ids_based_on_declarant(persons: list[dict]) -> None:
    """J5 (persons.py:479-512)."""
    for declarant in find_person("self", persons):
        father = find_person("father", persons)
        if father:
            update_ids(declarant, father, "father")
        mother = find_person("mother", persons)
        if mother:
            update_ids(declarant, mother, "mother")
        wife = find_person("wife", persons)
        if wife:
            update_ids(declarant, wife, "spouse", "probably" in wife[0]["relation_to_declarant"])
        husband = find_person("husband", persons)
        if husband:
            update_ids(declarant, husband, "spouse")
        siblings = find_person("brother", persons) + find_person("sister", persons)
        if siblings:
            update_ids(declarant, siblings, "siblings")
            remove_declarant_entry(siblings, "siblings")
        children = (
            find_person("son", persons)
            + find_person("daughter", persons)
            + find_person("son or daughter", persons)
        )
        if children:
            update_ids(declarant, children, "children")
            remove_declarant_entry(children, "children")


# ------------------------------------------------------------------------ J3

_SET_REL_WORDS = (
    "wife \\(\\?\\)|full sister and wife|wife and sister|sister and wife|"
    "wife and full sister|sister and divorced wife|wife|sister|"
    "brother of the father|husband|brother|relative|son|daughter|child|mother|br\\."
)


@functools.lru_cache(maxsize=64)
def _rel_patterns(tok: str) -> tuple[re.Pattern[str], ...]:
    """The 9-pattern cascade of set_relations (persons.py:543-551)."""
    raw = [
        r",\s*(" + _SET_REL_WORDS + r")\s*of\s*[^\[]*\[*\s*nos*\.\s*(?:{0})\s*\]\?*(.*brother)*",
        r",*\s*(" + _SET_REL_WORDS + r")\s*of\s*[^\[]*\[*\s*nos*\.\s*(?:{0})\s*\]\?*(.*brother)*",
        r",\s*(" + _SET_REL_WORDS + r")\s*of\s*[^\[]*\(*\s*nos*\.\s*(?:{0})\s*\)\?*(.*brother)*",
        r",*\s*(" + _SET_REL_WORDS + r")\s*of\s*[^\[]*\(*\s*nos*\.\s*(?:{0})\s*\)\?*(.*brother)*",
        r",\s*(" + _SET_REL_WORDS + r")\s*of\s*[^\[]*no\.[{0}]\?*(.*brother)*",
        r"[,]\s*(" + _SET_REL_WORDS.replace("wife \\(\\?\\)|", "") + r")\s*of\s*[^\[]*nos\. [{0}]\?*",
        r"[,]\s*(" + _SET_REL_WORDS.replace("wife \\(\\?\\)|", "") + r")\s*of\s*[^\[]*nos\. [[\d|l]\?* and]* [{0}]\?*",
        r"(s\.\/d\.|s\.|d\.|daughter|child|son).*?\[*\s*nos*\.\s*(?:{0})\s*\]\?*",
        r"(s\.\/d\.|s\.|d\.|daughter|child|son).*?\(*\s*nos*\.\s*(?:{0})\s*\)\?*",
    ]
    # the reference's pattern 7 contains a literal nested set
    # ("[[\d|l]?* and]*", persons.py:549) — silence Python's warning about
    # it; the quirk is preserved deliberately.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)
        return tuple(re.compile(p.format(tok), re.IGNORECASE) for p in raw)


def set_specific_relation(referenced: dict, referenced_by: dict, relation: str, referenced_index: int, question_mark: bool = False) -> None:
    """persons.py:520-539."""
    if relation in (
        "wife and sister", "sister and wife", "wife and full sister",
        "sister and divorced wife", "wife her brother", "full sister and wife",
    ):
        update_ids(referenced, [referenced_by], "spouse", question_mark)
        update_ids(referenced, [referenced_by], "siblings")
        remove_reference_num_entry(referenced, referenced_by, referenced_index, "siblings")
    elif relation in ("wife", "husband", "wife (?)"):
        update_ids(referenced, [referenced_by], "spouse", question_mark)
    elif relation in ("sister", "brother", "br."):
        update_ids(referenced, [referenced_by], "siblings")
        remove_reference_num_entry(referenced, referenced_by, referenced_index, "siblings")
    elif relation in ("son", "daughter", "child"):
        update_ids(referenced, [referenced_by], "children", question_mark)
        remove_reference_num_entry(referenced, referenced_by, referenced_index, "children")
    elif relation in ("mother", "father"):
        update_ids(referenced, [referenced_by], relation, question_mark)


def set_relations(referenced: dict, referenced_by: dict, referenced_index: int, question_mark: bool = False) -> None:
    """J3 (persons.py:542-633): first-match-wins over the pattern cascade."""
    tok = "1|l" if referenced_index == 1 else str(referenced_index)
    pats = _rel_patterns(tok)
    data = referenced_by["data"]
    for i, pat in enumerate(pats):
        m = pat.search(data)
        if not m:
            continue
        relation = m.group(1)
        if not relation:
            return
        if i == 0 and len(m.groups()) > 1 and m.group(2):
            relation += m.group(2).lower()
        if i >= 7:  # father/mother fallback patterns (persons.py:615-633)
            relation = relation.lower()
            if relation.startswith("s"):
                set_specific_relation(referenced, referenced_by, "son", referenced_index, question_mark)
            if relation.startswith("d") or relation.startswith("child"):
                set_specific_relation(referenced, referenced_by, "daughter", referenced_index, question_mark)
            return
        if i >= 5:
            relation = relation.lower()
        set_specific_relation(referenced, referenced_by, relation, referenced_index, question_mark)
        return


def set_relationship_ids(persons: list[dict]) -> None:
    """persons.py:669-683: declarant pass then all-pairs reference pass."""
    set_relationship_ids_based_on_declarant(persons)
    for index, person in enumerate(persons):
        for ref in find_number_reference(index + 1, persons):
            question_mark = False
            if isinstance(ref, str):
                val = int(ref.rstrip("?"))
                question_mark = True
            else:
                val = ref
            set_relations(person, persons[val - 1], index + 1, question_mark)


# ------------------------------------------------------------------------ J6

def add_declarant_as_person(household_id: str, dec_line, declarant_names: list[str], declarant_ids: list[str], persons: list[dict]) -> bool:
    """J6 anti-join insertion (persons.py:731-769)."""
    if find_person("self", persons) or not isinstance(dec_line, str):
        return False
    added = False
    lines = dec_line.split(";")
    for index, dec_name in enumerate(declarant_names):
        if index >= len(declarant_ids):
            break
        line = lines[index].lstrip("and") if index < len(lines) else dec_line
        person = {
            "household_id": household_id,
            "id": declarant_ids[index],
            "name": dec_name,
            "age": get_age(line),
            "sex": get_sex(line, "F"),
            "occupation": get_occupation(line),
            "father": get_father(line),
            "mother": get_mother(line),
            "paternal_grandfather": get_paternal_grand_father(line),
            "maternal_grandfather": get_maternal_grand_father(line),
            "spouse": get_spouses(line),
            "siblings": get_siblings(line),
            "children": [],
            "role": "family member",
            "relation_to_declarant": "self",
            "owner": None,
            "data": dec_line,
        }
        persons.insert(0, person) if persons else persons.append(person)
        added = True
    return added


# ----------------------------------------------------------------- stage B

PERSON_COLUMNS = [
    "household_id", "id", "name", "sex", "age", "occupation", "father",
    "mother", "paternal_grandfather", "maternal_grandfather", "spouse",
    "siblings", "children", "relation_to_declarant", "role", "owner",
]


def resolve_household(raw: dict) -> list[dict]:
    """Full stage-B pass for one household dict (the output of
    census_household.parse_households + enrich) — persons.py:783-800."""
    household_id = raw["household_number"]
    dec_ids = raw.get("declarant_id") or []
    dec_names = raw.get("declarant_name_parsed") or []

    family = parse_person(household_id, raw.get("name_of_family_members") or [], "F")
    set_personal_ids(household_id, dec_ids, dec_names, family)
    set_relationship_ids(family)
    if add_declarant_as_person(household_id, raw.get("declarant_name"), dec_names, dec_ids, family):
        set_relationship_ids_based_on_declarant(family)

    non_kin = parse_person(household_id, raw.get("name_of_non_family_members") or [], "K")
    set_personal_ids(household_id, dec_ids, dec_names, non_kin)
    set_relationship_ids(non_kin)

    slaves = parse_person(household_id, raw.get("slaves") or [], "S")
    set_personal_ids(household_id, dec_ids, dec_names, slaves)

    persons = family + non_kin + slaves  # stable order (persons.py:791-800, A4)
    return [{k: p.get(k) for k in PERSON_COLUMNS} for p in persons]
