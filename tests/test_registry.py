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
# an entry here — that's the point. Round 4 moved 50 former members
# into the gate window (the full-tilt rotation); this is the exact
# remaining queue — 101 names — for round 5's window (and the round
# after: 101 > 50, so full union coverage takes two more rounds).
CARRYOVER = {
    "amounts_extract",
    "bigram_coverage",
    "bigram_lift",
    "bigram_lm_score",
    "boundary_stitch",
    "bpe_pairs",
    "cdc_chunks",
    "cdc_savings",
    "centroid_shift",
    "chunk_overlap_pairs",
    "cluster_keep_best",
    "cluster_size_hist",
    "code_detect",
    "collapse_repeats",
    "compact_changelog",
    "context_cost",
    "conv_forks",
    "conv_stitch_arrow",
    "conv_truncate",
    "cooccurrence",
    "corpus_diff",
    "corpus_health",
    "corpus_tvd",
    "dates_extract",
    "dialogue_acts",
    "domain_cap",
    "domain_quality",
    "ece_ppm",
    "event_pivot",
    "filter_attrition",
    "fingerprint_pairs",
    "fk_violations",
    "global_index",
    "group_sample",
    "group_topk",
    "homoglyph_fold",
    "html_tables",
    "injection_scan",
    "interpolate_gaps",
    "json_props_extract",
    "jsonl_parse",
    "jsonl_stats",
    "k_anonymity",
    "kv_spans",
    "lang_confusion",
    "lang_segments",
    "length_buckets",
    "license_scan",
    "markdown_tables",
    "merge_spans",
    "mixture_plan",
    "mojibake_scan",
    "nfc_repair",
    "parity_report",
    "parrot_rate",
    "partitioned_export",
    "percent_rank",
    "pii_linkage",
    "pii_spans",
    "preference_bias",
    "quality_ensemble",
    "random_projection",
    "rank_agreement",
    "reading_level",
    "refusal_scan",
    "render_chatml",
    "response_grounding",
    "response_length_drift",
    "retry_runs",
    "retry_similarity",
    "role_token_share",
    "score_label_bins",
    "seeded_shuffle",
    "session_rollup",
    "skew_join",
    "skew_report",
    "sn_pairs",
    "source_mirror_pairs",
    "span_coverage",
    "special_token_leaks",
    "split_leakage",
    "stream_conv_state",
    "stream_response_join",
    "strip_repeated_lines",
    "token_diversity",
    "tokenize_ids",
    "tokenizer_fertility",
    "tool_args_keys",
    "tool_bigrams",
    "tool_chain_topk",
    "tool_latency_percentiles",
    "trailing_counts",
    "triangle_stats",
    "truncation_scan",
    "ts_audit",
    "url_frontier",
    "vocab_coverage",
    "watermark_lateness",
    "watermark_scan",
    "winsorize",
    "zorder_key",
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
