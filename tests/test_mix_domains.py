"""Domain mixing: exact Python md5 oracle (same string math as the
operator) plus mixture-proportion and determinism checks."""

import hashlib

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.sampling import _hex4, mix_domains


def _frac_keep(seed, epoch, doc_id, fhex):
    b = hashlib.md5(f"{seed}:{epoch}:{doc_id}".encode()).hexdigest()[:4]
    return b < fhex


def _docs(spark):
    rows = []
    for i in range(300):
        rows.append((i, "web"))
    for i in range(300, 400):
        rows.append((i, "code"))
    for i in range(400, 420):
        rows.append((i, "books"))
    for i in range(420, 430):
        rows.append((i, "junk"))  # not in weights -> dropped
    return spark.createDataFrame(rows, "doc_id long, domain string")


def test_mix_matches_exact_oracle(spark):
    df = _docs(spark)
    weights = {"web": 0.5, "code": 0.3, "books": 0.2}
    got = {
        (r["doc_id"], r["epoch"])
        for r in mix_domains(df, "domain", "doc_id", weights, epochs_cap=2.0).collect()
    }

    counts = {"web": 300, "code": 100, "books": 20}
    total = 2.0 * min(counts[d] / weights[d] for d in weights)  # books binds
    want = set()
    ranges = {"web": range(300), "code": range(300, 400), "books": range(400, 420)}
    for d, ids in ranges.items():
        rate = weights[d] * total / counts[d]
        whole = int(rate)
        fhex = _hex4(rate - whole)
        for i in ids:
            for e in range(whole):
                want.add((i, e))
            if _frac_keep("0", whole, i, fhex):
                want.add((i, whole))
    assert got == want

    # no junk rows, books repeated exactly at the cap
    assert all(400 <= i < 420 or i < 400 for i, _ in got)
    books = [e for i, e in got if 400 <= i < 420]
    assert len(books) == 40  # 20 docs x cap 2.0 exactly

    # achieved mixture tracks the target (quantization-level tolerance)
    by_domain = {"web": 0, "code": 0, "books": 0}
    for i, _ in got:
        d = "web" if i < 300 else ("code" if i < 400 else "books")
        by_domain[d] += 1
    n = sum(by_domain.values())
    for d, w in weights.items():
        assert abs(by_domain[d] / n - w) < 0.03, (d, by_domain, n)


def test_mix_deterministic_and_validated(spark):
    df = _docs(spark)
    w = {"web": 1.0, "code": 1.0}
    a = sorted(
        (r["doc_id"], r["epoch"])
        for r in mix_domains(df, "domain", "doc_id", w).collect()
    )
    b = sorted(
        (r["doc_id"], r["epoch"])
        for r in mix_domains(df, "domain", "doc_id", w).collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="absent"):
        mix_domains(df, "domain", "doc_id", {"web": 1.0, "nope": 1.0})
    with pytest.raises(ValueError, match="positive"):
        mix_domains(df, "domain", "doc_id", {"web": 0.0})
    with pytest.raises(ValueError, match="epochs_cap"):
        mix_domains(df, "domain", "doc_id", w, epochs_cap=0.5)
