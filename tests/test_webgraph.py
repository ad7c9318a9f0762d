"""Tests for the web-graph surface (operators/webgraph.py): link
extraction, anchor index, and integer-exact PageRank (cross-checked
against a pure-Python reference implementation and for partitioning
invariance)."""

import random

from pyspark.sql import functions as F

from pdf_extractors_spark.operators import text_stats, webgraph


def test_extract_links_golden(spark):
    df = spark.createDataFrame(
        [
            ("c0", 0, '<nav><a href="/a">Alpha</a> <a href="#">Skip</a></nav>'),
            ("c0", 1, "no links at all"),
            ("c1", 0, '<p>x</p><a href="/b?q=1">Beta link</a>'),
        ],
        "conv_id string, turn_idx int, text string",
    )
    rows = sorted(
        tuple(r) for r in webgraph.extract_links(df).collect()
    )
    assert rows == [
        ("c0", 0, 0, "/a", "Alpha"),
        ("c0", 0, 1, "#", "Skip"),
        ("c1", 0, 0, "/b?q=1", "Beta link"),
    ]


def test_anchor_index_caps_anchor_summary(spark):
    links = spark.createDataFrame(
        [("/hub", f"anchor-{i:02d}") for i in range(10)]
        + [("/hub", "anchor-00"), ("/leaf", "only")],
        "href string, anchor string",
    )
    out = {
        r["href"]: r for r in webgraph.anchor_index(links, max_anchors=3).collect()
    }
    assert out["/hub"]["n_links"] == 11
    assert out["/hub"]["n_anchors"] == 10
    # bounded summary: first 3 in bytewise order, never the whole set
    assert out["/hub"]["anchor_texts"] == "anchor-00|anchor-01|anchor-02"
    assert out["/leaf"]["anchor_texts"] == "only"


def _pagerank_py(edges, iters=10, scale=10**9, damp=85):
    """Reference implementation: same scaled-integer recurrence, plain
    dicts — any drift from the Spark operator is a real bug, not float
    noise, because both sides are exact."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {n: scale for n in nodes}
    teleport = (100 - damp) * scale // 100
    for _ in range(iters):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += pr[s] // outdeg[s]
        pr = {n: teleport + damp * inflow[n] // 100 for n in nodes}
    return pr


def test_pagerank_matches_reference_impl(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pr"] for r in webgraph.pagerank(df, iters=6).collect()}
    assert got == _pagerank_py(edges, iters=6)


def test_pagerank_partitioning_invariant(spark):
    rng = random.Random(11)
    edges = list({(rng.randrange(16), rng.randrange(16)) for _ in range(40)})
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["pr"] for r in webgraph.pagerank(df, iters=5).collect()}
    b = {
        r["node"]: r["pr"]
        for r in webgraph.pagerank(df.repartition(7), iters=5).collect()
    }
    assert a == b


def test_pagerank_sink_accumulates_teleport_only_inflow(spark):
    # 0 -> 1, 1 has no out-edges (dangling sink): it must still receive
    # the teleport term every round, and node 0 (no in-edges) settles at
    # exactly teleport
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r["node"]: r["pr"] for r in webgraph.pagerank(df, iters=10).collect()}
    assert got == _pagerank_py([(0, 1)], iters=10)
    assert got[0] == 150_000_000
    assert got[1] > got[0]  # sink gets teleport + 85% of 0's rank


def _hits_py(edges, iters=5, scale=10**6):
    """Reference HITS with the same division-first integer arithmetic."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})

    def norm(raw):
        d = max(sum(raw.values()) // scale, 1)
        return {n: raw.get(n, 0) // d for n in nodes}

    hub = {n: scale for n in nodes}
    auth = {}
    for _ in range(iters):
        raw_a = {n: 0 for n in nodes}
        for s, d in edges:
            raw_a[d] += hub[s]
        auth = norm(raw_a)
        raw_h = {n: 0 for n in nodes}
        for s, d in edges:
            raw_h[s] += auth[d]
        hub = norm(raw_h)
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_reference_impl(spark):
    rng = random.Random(13)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in webgraph.hits(df, iters=4).collect()
    }
    assert got == _hits_py(edges, iters=4)


def test_hits_partitioning_invariant(spark):
    rng = random.Random(17)
    edges = list({(rng.randrange(16), rng.randrange(16)) for _ in range(40)})
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: (r["hub"], r["auth"]) for r in webgraph.hits(df, iters=3).collect()}
    b = {
        r["node"]: (r["hub"], r["auth"])
        for r in webgraph.hits(df.repartition(7), iters=3).collect()
    }
    assert a == b


def test_hits_hub_authority_separation(spark):
    # star: 0 links to 1..4 (pure hub), 1..4 link nowhere else; 5 -> 1
    edges = [(0, d) for d in (1, 2, 3, 4)] + [(5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in webgraph.hits(df, iters=5).collect()
    }
    assert got == _hits_py(edges, iters=5)
    # node 0 is the dominant hub and no authority; 1..4 pure authorities
    assert got[0][0] > got[5][0] > 0
    assert got[0][1] == 0
    assert all(got[n][0] == 0 for n in (1, 2, 3, 4))
    # node 1 is pointed at by both hubs: strictly the top authority
    assert got[1][1] > got[2][1]


def _luhn_py(s: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_luhn_cards_verdicts(spark):
    docs = spark.createDataFrame(
        [
            (0, "pay with 4532015112830366 thanks"),  # valid visa-style
            (1, "typo'd 4532015112830367 digits"),  # off-by-one: invalid
            (2, "order 123456789012 is too short"),  # 12 digits: no row
            (3, "two: 4111111111111111 and 30569309025904 here"),
            (4, None),
            (5, "a 21-digit run 123456789012345678901 splits greedily"),
            (6, "11-digit 79927398713 is below the candidate floor"),
        ],
        "doc_id long, text string",
    )
    out = text_stats.luhn_cards(docs).collect()
    got = {(r["doc_id"], r["candidate"]): r["luhn_valid"] for r in out}
    assert got == {
        (0, "4532015112830366"): True,
        (1, "4532015112830367"): False,
        (3, "4111111111111111"): True,
        (3, "30569309025904"): _luhn_py("30569309025904"),
        # greedy non-overlap: 19 digits matched, trailing 2 can't form one
        (5, "1234567890123456789"): _luhn_py("1234567890123456789"),
    }
    # ordinal column: doc 3's runs index 0 and 1 in document order
    idx = {(r["doc_id"], r["candidate"]): r["cand_idx"] for r in out}
    assert idx[(3, "4111111111111111")] == 0
    assert idx[(3, "30569309025904")] == 1


def test_luhn_matches_python_reference(spark):
    rng = random.Random(3)
    runs = ["".join(rng.choice("0123456789") for _ in range(rng.randint(13, 19))) for _ in range(50)]
    docs = spark.createDataFrame(
        [(i, f"num {r} end") for i, r in enumerate(runs)], "doc_id long, text string"
    )
    got = {r["candidate"]: r["luhn_valid"] for r in text_stats.luhn_cards(docs).collect()}
    assert got == {r: _luhn_py(r) for r in runs}


def _lev_py(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_verify_matches_python(spark):
    from pdf_extractors_spark.operators import dedup

    texts = {
        1: "the quick brown fox jumps",
        2: "the quick brown fox jumped",  # 2 edits of 1 → dup at 20%
        3: "a completely different sentence here",
        4: "THE  Quick   Brown fox jumps",  # normalizes equal to 1
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): (r["edit_dist"], r["is_dup"])
        for r in dedup.edit_distance_verify(pairs, docs).collect()
    }

    def norm(s):
        return " ".join(s.lower().split())

    for (a, b), (dist, is_dup) in out.items():
        na, nb = norm(texts[a]), norm(texts[b])
        assert dist == _lev_py(na, nb)
        assert is_dup == (dist * 10000 <= max(len(na), len(nb)) * 2000)
    assert out[(1, 4)] == (0, True)
    assert out[(1, 3)][1] is False


def test_edit_distance_verify_keyed_joins_only(spark, tmp_path):
    from pdf_extractors_spark.operators import dedup
    from tests.test_plans import _plan

    dpath, ppath = str(tmp_path / "d"), str(tmp_path / "p")
    spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    ).write.parquet(dpath)
    spark.createDataFrame([(1, 2)], "id_a long, id_b long").write.parquet(ppath)
    plan = _plan(
        dedup.edit_distance_verify(
            spark.read.parquet(ppath), spark.read.parquet(dpath)
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_robots_filter_longest_match_wins(spark):
    from pdf_extractors_spark.operators import urls as urls_op

    rules = spark.createDataFrame(
        [("/private", False), ("/private/open", True), ("/a", False), ("/a", True)],
        "prefix string, allow boolean",
    )
    paths = spark.createDataFrame(
        [
            (0, "/private/secret"),  # deny
            (1, "/private/open/doc"),  # nested allow overrides deny
            (2, "/public/x"),  # no rule: default allow
            (3, "/a/tie"),  # equal-length conflicting rules: allow wins
        ],
        "doc_id long, path string",
    )
    out = {
        r["doc_id"]: (r["allowed"], r["matched_prefix"])
        for r in urls_op.robots_filter(paths, rules).collect()
    }
    assert out == {
        0: (False, "/private"),
        1: (True, "/private/open"),
        2: (True, None),
        3: (True, "/a"),
    }


def test_robots_filter_broadcasts_rules(spark, tmp_path):
    from pdf_extractors_spark.operators import urls as urls_op
    from tests.test_plans import _plan

    path = str(tmp_path / "paths")
    spark.createDataFrame(
        [(i, f"/p/{i}") for i in range(100)], "doc_id long, path string"
    ).write.parquet(path)
    rules = spark.createDataFrame([("/p", True)], "prefix string, allow boolean")
    plan = _plan(urls_op.robots_filter(spark.read.parquet(path), rules))
    # the theta join MUST be broadcast-nested-loop with the rules side
    # broadcast — bounded rule set streams past the corpus; what must
    # never appear is an un-broadcast cartesian
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_split_sentences_offsets_exact(spark):
    texts = {
        0: "First sentence. Second one! Third?? And a trailing fragment",
        1: "...leading punctuation",
        2: "no terminator at all",
        3: "",
        4: None,
        5: "Multi.  Spaced.   Runs!",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = text_stats.split_sentences(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r["sent_idx"])
        t = texts[d]
        if not t:  # null or empty: single preserved null row
            assert len(rs) == 1
            assert (rs[0]["sentence"], rs[0]["sent_start"], rs[0]["sent_end"]) == (None, None, None)
            continue
        # slicing invariant and full coverage in order
        assert rs[0]["sent_start"] == 0
        assert rs[-1]["sent_end"] == len(t)
        for a, b in zip(rs, rs[1:]):
            assert a["sent_end"] == b["sent_start"]
        for r in rs:
            assert t[r["sent_start"]:r["sent_end"]] == r["sentence"]
    # boundary grammar: terminator runs close a sentence
    assert [r["sentence"] for r in by_doc[0]] == [
        "First sentence.", " Second one!", " Third??", " And a trailing fragment",
    ]
    assert [r["sentence"] for r in by_doc[1]] == ["...", "leading punctuation"]


def _triangle_py(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tris = sum(
        1
        for a, b in und
        for c in adj[a] & adj[b]
        if a < b < c  # count each triangle exactly once
    )
    wedges = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes)
    return {
        "n_nodes": len(nodes),
        "n_edges": len(und),
        "n_wedges": wedges,
        "n_triangles": tris,
        "closure_ppm": (3 * tris * 10**6) // wedges if wedges else 0,
    }


def test_triangle_stats_known_graphs(spark):
    # K4: 4 triangles, 12 wedges, closure 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, "src long, dst long")
    got = webgraph.triangle_stats(df).collect()[0].asDict()
    assert got == {
        "n_nodes": 4, "n_edges": 6, "n_wedges": 12,
        "n_triangles": 4, "closure_ppm": 1000000,
    }
    # star: no triangles, wedges = C(4,2) at the hub
    star = [(0, d) for d in (1, 2, 3, 4)]
    got = webgraph.triangle_stats(
        spark.createDataFrame(star, "src long, dst long")
    ).collect()[0].asDict()
    assert got["n_triangles"] == 0 and got["n_wedges"] == 6
    assert got["closure_ppm"] == 0


def test_triangle_stats_matches_reference_and_input_form(spark):
    # random digraph with duplicates, self-loops, both orientations
    rng = random.Random(99)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(120)]
    expect = _triangle_py(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = webgraph.triangle_stats(df).collect()[0].asDict()
    assert got == expect
    # partitioning invariance
    got2 = webgraph.triangle_stats(df.repartition(7)).collect()[0].asDict()
    assert got2 == expect
