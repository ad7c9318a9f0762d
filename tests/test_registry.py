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
# an entry here — that's the point.
CARRYOVER = {
    "jsonl_export",
    "ngram_counts",
    "blocklist_filter",
    "response_grounding",
    "refusal_scan",
    "dsir_weights",
    "mojibake_scan",
    "mojibake_repair",
    "cooccurrence",
    # added after this round's window was pinned; rotate in next round
    "ndcg_eval",
    "response_rouge",
    "warc_parse",
    "hll_distinct",
    "hard_negatives",
    "context_cost",
    "dehyphenate",
    "strip_repeated_lines",
    "bag_dedup",
    "sparse_cosine_pairs",
    "collapse_repeats",
    "merge_spans",
    "span_coverage",
    "lang_segments",
    "minhash_jaccard_est",
    "bloom_decontaminate",
    "template_turns",
    "turn_latency_stats",
    "prefix_dedup",
    "corpus_diff",
    "ngram_novelty",
    "stream_neardup",
    "quality_ensemble",
    "conv_truncate",
    "length_buckets",
    "token_diversity",
    "corpus_tvd",
    "bigram_coverage",
    "group_sample",
    "stream_conv_state",
    "simhash_hamming_pairs",
    "k_anonymity",
    "session_rollup",
    "conv_stitch_arrow",
    "watermark_lateness",
    "retry_runs",
    "tool_args_keys",
    "lsh_degree_hist",
    "cdc_savings",
    "rank_agreement",
    "parrot_rate",
    "centroid_shift",
    "pii_echo",
    "conv_forks",
    "retry_similarity",
    "pii_linkage",
    "injection_scan",
    "truncation_scan",
    "homoglyph_fold",
    "dialogue_acts",
    "reading_level",
    "response_length_drift",
    "tool_chain_topk",
    "ts_audit",
    "watermark_scan",
    "amounts_extract",
    "kv_spans",
    "linear_score",
    "jsonl_parse",
    "jsonl_stats",
    "quantize_int8",
    "sn_pairs",
    "seeded_shuffle",
    "rank_auc",
    "url_frontier",
    "preference_bias",
    "score_label_bins",
    "ece_ppm",
    "invisible_chars",
    "license_scan",
    "mixture_plan",
    "render_chat",
    "loss_mask_spans",
    "bigram_lm_score",
    "char_entropy",
    "tokenizer_fertility",
    "dates_extract",
    "html_tables",
    "prompt_dedup",
    "code_detect",
    "markdown_strip",
    "special_token_leaks",
    "domain_quality",
    "markdown_tables",
    "render_chatml",
    "corpus_health",
    "stream_response_join",
    "stream_enrich",
    "filter_attrition",
    "windowed_dedup",
    "embedding_stats",
    "ann_recall",
    "source_mirror_pairs",
    "tool_latency_percentiles",
    "conv_neardup",
    "role_token_share",
    "vocab_coverage",
    "domain_cap",
    "skew_report",
    "bpe_pairs",
    "nfc_repair",
    "tool_call_stats",
    "partitioned_export",
    "triangle_stats",
    "corpus_clean",
    "tokenize_ids",
    "conv_sessions",
    "tool_bigrams",
    "fingerprint_pairs",
    "lang_confusion",
    "cluster_size_hist",
    "random_projection",
    "snapshot_merge",
    "json_props_extract",
    "group_topk",
    "parity_report",
    "skew_join",
    "bigram_lift",
    "cdc_chunks",
    "winsorize",
    "postings",
    "trailing_counts",
    "event_pivot",
    "percent_rank",
    "zorder_key",
    "fk_violations",
    "chunk_overlap_pairs",
    "compact_changelog",
    "scd2_intervals",
    "cluster_keep_best",
    "containment_pairs",
    "global_index",
    "boundary_stitch",
    "interpolate_gaps",
    "sft_pack",
    "split_leakage",
    "pii_spans",
    "lsh_eval",
    "kmv_distinct",
    "kmv_overlap",
    "cms_heavy_hitters",
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
