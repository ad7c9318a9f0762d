"""dialogue_acts (pipeline.py) + reading_level (text_stats.py):
hand-built turns covering every act in the cascade (and its priority
order), exact Flesch-Kincaid integer values, the no-words null, and
the plan budgets."""

from pdf_extractors_spark import pipeline, plans
from pdf_extractors_spark.operators import text_stats

_T_SCHEMA = "conv_id string, turn_idx int, role string, text string"
_D_SCHEMA = "doc_id long, text string"


def _t(spark, rows):
    return spark.createDataFrame(rows, _T_SCHEMA)


# ----------------------------------------------------------------- acts


def _acts(df):
    return {
        (r["conv_id"], r["role"], r["act"]): (r["n_turns"], r["n_chars"])
        for r in df.collect()
    }


def test_act_cascade_and_priority(spark):
    rows = [
        ("A", 0, "user", "what is this?"),
        ("A", 1, "assistant", "It is a test."),
        ("A", 2, "user", "fix the bug please"),
        # code beats question: fenced block wins even with trailing '?'
        ("A", 3, "user", "```py\nx\n``` ok?"),
        ("A", 4, "assistant", None),
        ("A", 5, "assistant", "   "),
        # capitalized opener still matches (first word lowercased)
        ("A", 6, "user", "Write a poem"),
    ]
    got = _acts(pipeline.dialogue_acts(_t(spark, rows)))
    assert got[("A", "user", "question")] == (1, 13)
    assert got[("A", "assistant", "statement")] == (1, 13)
    assert got[("A", "user", "command")] == (2, 18 + 12)
    assert got[("A", "user", "code")] == (1, 15)
    assert got[("A", "assistant", "empty")] == (2, 3)
    assert len(got) == 5


def test_acts_grouped_per_conversation_and_role(spark):
    rows = [
        ("B", 0, "user", "hi there"),
        ("B", 1, "assistant", "hi there"),
        ("C", 0, "user", "hi there"),
    ]
    got = _acts(pipeline.dialogue_acts(_t(spark, rows)))
    assert got == {
        ("B", "user", "statement"): (1, 8),
        ("B", "assistant", "statement"): (1, 8),
        ("C", "user", "statement"): (1, 8),
    }


def test_acts_plan_budget(spark):
    df = pipeline.dialogue_acts(_t(spark, [("A", 0, "user", "x")]))
    a = plans.assert_plan(
        df,
        no_single_partition=True,
        no_python=True,
        shuffle_keys={"conv_id", "role", "act"},
    )
    assert a.n_exchanges <= 1, a.plan


# -------------------------------------------------------------- reading


def _rl(spark, rows):
    return {
        r["doc_id"]: (
            r["n_words"],
            r["n_sentences"],
            r["n_syllables"],
            r["fk_grade_x100"],
        )
        for r in text_stats.reading_level(
            spark.createDataFrame(rows, _D_SCHEMA)
        ).collect()
    }


def test_reading_level_exact_values(spark):
    got = _rl(
        spark,
        [
            (1, "Hello world. It works fine."),
            (2, "no punctuation here"),
            (3, ""),
            (4, None),
        ],
    )
    # doc 1: 5 words, 2 sentences, 7 vowel groups
    #   floor(39*5/2 + 1180*7/5 - 1559) = floor(190.5) = 190
    assert got[1] == (5, 2, 7, 190)
    # doc 2: 3 words, sentences floored at 1, 6 vowel groups
    #   floor(117 + 2360 - 1559) = 918
    assert got[2] == (3, 1, 6, 918)
    # no words: nothing to grade -> null, counts preserved
    assert got[3] == (0, 1, 0, None)
    assert got[4] == (0, 1, 0, None)


def test_reading_level_simple_text_scores_lower(spark):
    got = _rl(
        spark,
        [
            (1, "The cat sat. The dog ran. It was fun."),
            (2, "Nevertheless, computational heterogeneity necessitates "
                "organizational differentiation."),
        ],
    )
    assert got[1][3] < got[2][3]


def test_reading_level_plan_budget(spark):
    df = text_stats.reading_level(
        spark.createDataFrame([(1, "x.")], _D_SCHEMA)
    )
    a = plans.assert_plan(
        df, max_exchanges=0, no_single_partition=True, no_python=True
    )
    assert a.n_exchanges == 0, a.plan
