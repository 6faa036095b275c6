"""The bench regression gate's round-file parsing: the driver stores the
bench JSON line wrapped in its own envelope under "parsed", and the gate
must unwrap it (r5 found it silently comparing against nothing)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _prev_round_bench  # noqa: E402


def _write(d, name, payload):
    with open(os.path.join(d, name), "w", encoding="utf-8") as fh:
        json.dump(payload, fh)


def test_prev_round_unwraps_driver_envelope(tmp_path):
    d = str(tmp_path)
    _write(d, "BENCH_r03.json", {"parsed": {"sf": 0.1, "queries": {"q": 1.0}}})
    _write(
        d,
        "BENCH_r04.json",
        {"n": 4, "rc": 0, "sf": 0.1,
         "parsed": {"sf": 0.1, "queries": {"q": 2.0}, "value": 2.0}},
    )
    got = _prev_round_bench(d)
    assert got["_round"] == 4
    assert got["queries"] == {"q": 2.0}  # inner payload, not the envelope


def test_prev_round_accepts_bare_payload_and_missing(tmp_path):
    d = str(tmp_path)
    assert _prev_round_bench(d) is None
    _write(d, "BENCH_r07.json", {"sf": 0.1, "queries": {"q": 3.0}})
    got = _prev_round_bench(d)
    assert got["_round"] == 7 and got["queries"] == {"q": 3.0}


def test_prev_round_survives_corrupt_file(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "BENCH_r09.json"), "w") as fh:
        fh.write("{not json")
    assert _prev_round_bench(d) is None


# the r5 driver envelope: "parsed" is null and the bench line exists only
# as a tail string whose FRONT was cut inside the sf0.1 queries map; the
# sf1 block and regressions survive intact later in the line
R05_TAIL = (
    '.551, "x_dedup_simhash_dedup": 3.255, "x_sim_bruteforce": 0.737, '
    '"flagship_segments": 0.875, "x_corpus_diff": 0.413}, "sf": 0.1, '
    '"policy": "min_of_2; min_of_3 on >25%-vs-prev-round regressions", '
    '"sf1": {"queries": {"x_dedup_pipeline": 14.557, "w1_dedup_latest_agg": '
    '1.143}, "total_sec": 15.7, "gen_sec": 12.0}, "regressions": '
    '[{"query": "x_dedup_pipeline", "scope": "sf1", "prev_sec": 7.384, '
    '"now_sec": 14.557, "delta_pct": 97.1}], "vs_round": 4}'
)


def test_prev_round_recovers_truncated_envelope(tmp_path):
    """parsed:null + truncated tail (the real BENCH_r05.json shape) must
    NOT be accepted as an empty-queries payload — the gate recovers the
    surviving query timings and the intact sf1 block from the tail."""
    d = str(tmp_path)
    _write(d, "BENCH_r05.json",
           {"n": 5, "rc": 0, "cpus": 32, "sf": 0.1, "tail": R05_TAIL,
            "parsed": None})
    got = _prev_round_bench(d)
    assert got is not None and got["_round"] == 5
    assert got["sf"] == 0.1
    # partial sf0.1 map: the surviving pairs, no envelope scalars leaked in
    assert got["queries"] == {
        "x_dedup_simhash_dedup": 3.255, "x_sim_bruteforce": 0.737,
        "flagship_segments": 0.875, "x_corpus_diff": 0.413,
    }
    # the sf1 block survives whole — this is what the sf1 gate compares
    assert got["sf1"]["queries"] == {
        "x_dedup_pipeline": 14.557, "w1_dedup_latest_agg": 1.143,
    }


def test_prev_round_recovers_full_line_in_tail(tmp_path):
    d = str(tmp_path)
    line = json.dumps({"metric": "m", "sf": 0.1, "queries": {"q": 1.5}})
    _write(d, "BENCH_r06.json",
           {"sf": 0.1, "tail": "noise before\n" + line, "parsed": None})
    got = _prev_round_bench(d)
    assert got["_round"] == 6 and got["queries"] == {"q": 1.5}


def test_prev_round_prefers_local_record_over_unusable_envelope(tmp_path):
    """When the newest envelope is unrecoverable, BENCH_LOCAL.json (the
    bench run's own durable record) wins over older rounds' envelopes."""
    d = str(tmp_path)
    _write(d, "BENCH_r04.json", {"parsed": {"sf": 0.1, "queries": {"q": 9.0}}})
    _write(d, "BENCH_r05.json", {"sf": 0.1, "parsed": None, "tail": "garbage"})
    _write(d, "BENCH_LOCAL.json", {"sf": 0.1, "queries": {"q": 2.0}})
    got = _prev_round_bench(d)
    assert got["_source"] == "local" and got["_round"] == 5
    assert got["queries"] == {"q": 2.0}


def test_prev_round_falls_back_to_older_round_without_local(tmp_path):
    d = str(tmp_path)
    _write(d, "BENCH_r04.json", {"parsed": {"sf": 0.1, "queries": {"q": 9.0}}})
    _write(d, "BENCH_r05.json", {"sf": 0.1, "parsed": None, "tail": "garbage"})
    got = _prev_round_bench(d)
    assert got["_round"] == 4 and got["queries"] == {"q": 9.0}


def test_prev_round_never_returns_queryless_payload(tmp_path):
    """An envelope with sf but no queries (and no recoverable tail) must
    yield None, not a payload the gate would silently diff against {}."""
    d = str(tmp_path)
    _write(d, "BENCH_r05.json", {"sf": 0.1, "parsed": None})
    assert _prev_round_bench(d) is None
