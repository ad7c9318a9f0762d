"""Gate-window contract guard (no Spark needed).

The driver's correctness gate records exactly the first
``_GATE_WINDOW`` entries of ``__spark_entry__.queries()``.  Round 2
lost 18 value checks to silent registry drift; these tests make that
class of regression loud:

* the pinned ``_GATE_ORDER`` must be exactly the window prefix, with
  every name present, unique, and value-oracled;
* every value-oracled query OUTSIDE the window must either already
  have a driver row in a prior round's CORRECTNESS file (union
  coverage — the rotation policy) or be named in the explicit
  carryover list below, which is the queue for next round's window.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Oracled queries knowingly awaiting a driver row in a FUTURE round's
# window (slots are finite; these are pytest + local-replay green).
# Adding a new oracled query mid-round REQUIRES either a window slot or
# an entry here — that's the point. Round 5 promoted 50 of the round-4
# queue's 101 names into the gate window (every verdict-named priority
# included); this is the exact remaining queue — 51 names — for round
# 6's window, which completes the driver-gated union (200 + 51 = 251
# oracled + the rows-only remainder).
CARRYOVER = {
    "bigram_coverage",
    "bigram_lift",
    "bigram_lm_score",
    "boundary_stitch",
    "bpe_pairs",
    "centroid_shift",
    "collapse_repeats",
    "compact_changelog",
    "context_cost",
    "corpus_diff",
    "corpus_health",
    "domain_cap",
    "domain_quality",
    "ece_ppm",
    "event_pivot",
    "filter_attrition",
    "fk_violations",
    "homoglyph_fold",
    "interpolate_gaps",
    "jsonl_parse",
    "jsonl_stats",
    "lang_confusion",
    "length_buckets",
    "mojibake_scan",
    "nfc_repair",
    "parity_report",
    "parrot_rate",
    "percent_rank",
    "preference_bias",
    "random_projection",
    "rank_agreement",
    "reading_level",
    "render_chatml",
    "response_grounding",
    "response_length_drift",
    "score_label_bins",
    "source_mirror_pairs",
    "special_token_leaks",
    "strip_repeated_lines",
    "token_diversity",
    "tokenize_ids",
    "tokenizer_fertility",
    "tool_args_keys",
    "tool_bigrams",
    "trailing_counts",
    "triangle_stats",
    "truncation_scan",
    "url_frontier",
    "vocab_coverage",
    "watermark_scan",
    "winsorize",
}


def _prior_driver_rows() -> set[str]:
    names: set[str] = set()
    for fn in sorted(os.listdir(_ROOT)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            names |= set(json.load(open(os.path.join(_ROOT, fn))))
    return names


def test_gate_order_is_window_prefix():
    qs = list(entrymod.queries().keys())
    assert len(entrymod._GATE_ORDER) == entrymod._GATE_WINDOW
    assert len(set(entrymod._GATE_ORDER)) == len(entrymod._GATE_ORDER)
    assert qs[: entrymod._GATE_WINDOW] == entrymod._GATE_ORDER


def test_window_queries_all_value_oracled():
    oracles = entrymod.oracle_sql()
    missing = [n for n in entrymod._GATE_ORDER if n not in oracles]
    assert not missing, f"gate-window queries without a value oracle: {missing}"


def test_no_oracled_query_silently_unverified():
    qs = list(entrymod.queries().keys())
    oracles = set(entrymod.oracle_sql())
    window = set(qs[: entrymod._GATE_WINDOW])
    covered = _prior_driver_rows() | window | CARRYOVER
    orphans = [q for q in qs if q in oracles and q not in covered]
    assert not orphans, (
        "value-oracled queries with no driver row in any round, no "
        f"window slot this round, and no CARRYOVER entry: {orphans}"
    )


def test_carryover_entries_still_exist():
    qs = set(entrymod.queries().keys())
    stale = CARRYOVER - qs
    assert not stale, f"CARRYOVER names not in the registry: {stale}"
