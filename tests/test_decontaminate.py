"""decontaminate: benchmark decontamination via winnowing fingerprints.

The winnowing guarantee (any verbatim overlap of length >= k + window - 1
chars shares a fingerprint) makes the test constructive: a train doc that
quotes one eval sentence MUST be dropped, and the test guards its own
negative cases by asserting (pure Python) that the clean docs share no
character k-gram with the eval set — so a kept doc is kept by
construction, not by luck.
"""

from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.dedup import decontaminate

K, W = 9, 4
GUARANTEE = K + W - 1  # 12 chars

EVAL_DOCS = [
    (101, "Which planet is known as the red planet? Mars is the answer."),
    (102, "Compute the integral of x squared from zero to one. It equals one third."),
]

CLEAN_1 = "zygomorphic blossoms unfurl quixotically beneath vermilion skies"
CLEAN_2 = "juggling flasks, the gnome hummed b-flat melodies off-key"
QUOTER = (
    "My study guide notes: "
    + EVAL_DOCS[0][1]
    + " Remember to review this before Friday."
)
COPY = EVAL_DOCS[1][1]
TINY = "hi"  # shorter than k: zero fingerprints, must survive

TRAIN_DOCS = [
    (1, CLEAN_1),
    (2, QUOTER),
    (3, COPY),
    (4, TINY),
    (5, CLEAN_2),
]


def _kgrams(t, k=K):
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def test_fixture_negatives_are_clean_by_construction():
    eval_grams = set()
    for _, t in EVAL_DOCS:
        eval_grams |= _kgrams(t)
    for t in (CLEAN_1, CLEAN_2):
        assert not (_kgrams(t) & eval_grams), "fixture broken: clean doc shares a k-gram"


def test_decontaminate_drops_quoters_keeps_clean(spark):
    train = spark.createDataFrame(TRAIN_DOCS, "doc_id long, text string")
    eval_df = spark.createDataFrame(EVAL_DOCS, "doc_id long, text string")
    kept = decontaminate(train, eval_df, k=K, window=W)
    ids = {r["doc_id"] for r in kept.collect()}
    # quoting one eval sentence (>= 12-char overlap) and verbatim copy both
    # dropped; disjoint-vocabulary and sub-k docs survive
    assert ids == {1, 4, 5}
    # schema passthrough: output is the train schema, untouched
    assert kept.columns == ["doc_id", "text"]


def test_decontaminate_plan_broadcasts_eval_side(spark):
    train = spark.createDataFrame(TRAIN_DOCS, "doc_id long, text string")
    eval_df = spark.createDataFrame(EVAL_DOCS, "doc_id long, text string")
    kept = decontaminate(train, eval_df, k=K, window=W)
    qe = kept._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = qe.explainString(mode)
    # the eval fingerprint set is broadcast into the semi join — the train
    # corpus is never shuffled for candidate detection
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_default_scale_catches_sentence_quotes_not_common_phrases(spark):
    # defaults flag spans >= k + window - 1 = 59 chars: a verbatim
    # sentence-length quote is contamination, a shared 3-word idiom is not
    sentence = "The mitochondria is the powerhouse of the cell, as every textbook says."
    assert len(sentence) >= 59
    quoter = "Lecture notes follow. " + sentence + " End of the quoted material."
    phrase_sharer = (
        "This text merely reuses as every textbook would, the common idiom "
        "without copying any long passage from the evaluation corpus at all."
    )
    train = spark.createDataFrame(
        [(1, quoter), (2, phrase_sharer)], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame([(9, sentence)], "doc_id long, text string")
    kept = {r["doc_id"] for r in decontaminate(train, eval_df).collect()}
    assert kept == {2}


def test_decontaminate_empty_eval_keeps_everything(spark):
    train = spark.createDataFrame(TRAIN_DOCS, "doc_id long, text string")
    eval_df = spark.createDataFrame([], "doc_id long, text string")
    kept = decontaminate(train, eval_df, k=K, window=W)
    assert kept.count() == len(TRAIN_DOCS)


def test_contamination_report_names_sources_and_matches_drop_set(spark):
    from local_pubchem_db_spark.operators.dedup import contamination_report

    train = spark.createDataFrame(TRAIN_DOCS, "doc_id long, text string")
    eval_df = spark.createDataFrame(EVAL_DOCS, "doc_id long, text string")
    report = contamination_report(
        train, eval_df, "doc_id", "doc_id", "text", k=K, window=W
    ).collect()
    by_pair = {(r["doc_id"], r["eval_id"]): r["n_shared_fps"] for r in report}
    # the quoter matches eval 101 only; the verbatim copy matches 102 only
    assert set(by_pair) == {(2, 101), (3, 102)}
    # the full copy shares at least as many fingerprints as the partial
    # quote shares with ITS source (both against their own eval doc)
    assert by_pair[(3, 102)] >= 1 and by_pair[(2, 101)] >= 1
    # audit trail consistency: reported train ids == decontaminate's drops
    kept = {
        r["doc_id"]
        for r in decontaminate(
            train, eval_df, "doc_id", "text", k=K, window=W
        ).collect()
    }
    dropped = {r[0] for r in {(d, e) for d, e in by_pair}}
    assert dropped == {1, 2, 3, 4, 5} - kept
