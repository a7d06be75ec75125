"""bench.py helper contracts (no Spark needed): the drift yardstick must
pick the highest parsed round and skip unparsed/corrupt artifacts — the
r4 artifact was parsed:null and must never become the baseline."""

import json


def test_load_previous_artifact_picks_highest_parsed(tmp_path):
    from bench import _load_previous_artifact

    def write(n, payload):
        (tmp_path / f"BENCH_r{n}.json").write_text(json.dumps(payload))

    write(3, {"parsed": {"value": 9.6, "sf": 0.1, "queries": {"q": 1.0}}})
    write(4, {"parsed": None, "rc": 1})  # the r4 shape: never a baseline
    write(5, {"parsed": {"value": 11.5, "sf": 0.1, "queries": {"q": 1.2}}})
    (tmp_path / "BENCH_r6.json").write_text("{corrupt")  # unreadable
    (tmp_path / "BENCH_rX.json").write_text("{}")  # non-matching name

    name, parsed = _load_previous_artifact(str(tmp_path))
    assert name == "BENCH_r5.json"
    assert parsed["value"] == 11.5 and parsed["queries"] == {"q": 1.2}


def test_load_previous_artifact_empty_dir(tmp_path):
    from bench import _load_previous_artifact

    assert _load_previous_artifact(str(tmp_path)) == (None, None)
