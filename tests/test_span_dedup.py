"""Substring-level exact dedup (remove_duplicate_spans) vs a pure-Python
oracle implementing the same canonical-occurrence rule on token strings
(the operator hashes windows with xxhash64; a disagreement would need a
64-bit collision)."""

from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.dedup import remove_duplicate_spans


def _oracle(docs: dict[int, str], span: int, min_occ: int = 2) -> dict[int, tuple[str, int]]:
    # window string -> sorted list of (doc_id, pos)
    occ: dict[str, list[tuple[int, int]]] = {}
    toks = {d: t.strip().split() for d, t in docs.items()}
    for d in sorted(toks):
        tk = toks[d]
        for p in range(len(tk) - span + 1):
            occ.setdefault(" ".join(tk[p : p + span]), []).append((d, p))
    cut: dict[int, set[int]] = {d: set() for d in docs}
    for places in occ.values():
        if len(places) < min_occ:
            continue
        canon = min(places)
        for d, p in places:
            if (d, p) != canon:
                cut[d].add(p)
    out = {}
    for d, tk in toks.items():
        keep = [True] * len(tk)
        for s in cut[d]:
            for i in range(s, min(s + span, len(tk))):
                keep[i] = False
        kept = [t for t, k in zip(tk, keep) if k]
        out[d] = (" ".join(kept), len(tk) - len(kept))
    return out


def _words(label: str, n: int) -> str:
    return " ".join(f"{label}{i}" for i in range(n))


def test_span_dedup_matches_oracle(spark):
    boiler = _words("lic", 6)  # 6-token boilerplate shared verbatim
    docs = {
        1: _words("a", 8) + " " + boiler + " " + _words("b", 5),
        2: _words("c", 4) + " " + boiler + " " + _words("d", 7),
        3: boiler + " " + _words("e", 9),
        4: _words("f", 12),  # clean
        5: "short doc",     # below the span size: untouched
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in remove_duplicate_spans(df, span_tokens=4).collect()
    }
    want = _oracle(docs, span=4)
    assert got == want
    # the canonical copy survives somewhere, exactly once
    n_with_boiler = sum(1 for t, _ in got.values() if boiler in t)
    assert n_with_boiler == 1
    # doc 1 holds the canonical (lowest (id, pos)) occurrence
    assert boiler in got[1][0]
    assert got[4] == (docs[4], 0)
    assert got[5] == (docs[5], 0)


def test_span_dedup_overlapping_windows_merge(spark):
    # A 10-token run shared by two docs produces 7 overlapping dup
    # windows (span 4); the cut intervals must merge so exactly the
    # shared run disappears from the non-canonical doc — not more.
    run = _words("r", 10)
    docs = {
        1: run + " " + _words("x", 3),
        2: _words("y", 5) + " " + run,
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in remove_duplicate_spans(df, span_tokens=4).collect()
    }
    assert got == _oracle(docs, span=4)
    assert got[1] == (docs[1], 0)  # canonical copy untouched
    assert got[2][0] == _words("y", 5)
    assert got[2][1] == 10


def test_span_dedup_partitioning_invariant_and_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in remove_duplicate_spans(docs, span_tokens=8).collect()
    }
    b = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in remove_duplicate_spans(
            docs.repartition(13), span_tokens=8
        ).collect()
    }
    assert a == b
    assert len(a) == docs.count()

    # window hashing is JVM codegen, not a Python UDF: the explode side
    # must carry no ArrowEvalPython/BatchEvalPython
    from local_pubchem_db_spark.operators.dedup import _window_hashes

    plan = (
        _window_hashes(docs, "doc_id", "text", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan
