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


# --------------------------------------------------- canary normalization


def test_host_ratio_slower_host_loosens_never_tightens():
    from bench import _host_ratio

    assert _host_ratio(0.13, 0.10) == 1.3          # 30% slower host
    assert _host_ratio(0.08, 0.10) == 1.0          # faster host: clamp
    assert _host_ratio(1.0, 0.1) == 3.0            # sanity cap
    assert _host_ratio(None, 0.1) == 1.0           # prev round had none
    assert _host_ratio(0.1, None) == 1.0
    assert _host_ratio(0.1, 0.0) == 1.0


def test_gate_normalizes_by_canary_on_synthetic_slow_host():
    """The r9 scenario, synthesized: every entry +28% raw on a container
    whose canary says it is 30% slower — the normalized gate clears all
    of them without a single re-time (spark=None proves no re-time ran);
    with ratio 1.0 the same envelope flags everything."""
    from bench import gate_regressions

    prev = {f"q{i}": 1.0 for i in range(15)}
    now = {f"q{i}": 1.28 for i in range(15)}

    flags = gate_regressions(
        None, "/nowhere", [], dict(now), prev, "sf0.1", host_ratio=1.3
    )
    assert flags == []

    raw = gate_regressions(
        None, "/nowhere", [], dict(now), prev, "sf0.1", host_ratio=1.0
    )
    assert len(raw) == 15  # unnormalized, every entry would have flagged


def test_gate_flags_real_regression_through_slow_host():
    """Normalization must not swallow a genuine code regression: an entry
    2.2x slower still flags on a 1.3x-slower host, and the row carries
    the host-corrected delta."""
    from bench import gate_regressions

    flags = gate_regressions(
        None, "/nowhere", [], {"q0": 2.2}, {"q0": 1.0}, "sf1",
        host_ratio=1.3,
    )
    assert [f["query"] for f in flags] == ["q0"]
    assert flags[0]["delta_pct"] == 120.0
    assert flags[0]["norm_delta_pct"] == round(100 * (2.2 / 1.3 - 1), 1)


# --------------------------------------------------- worktree A/B control


def test_ab_control_clears_flags_old_code_reproduces(tmp_path):
    """The r9 manual worktree control, automated: 15 unrelated entries
    flag at once, the previous round's code re-timed on this box shows
    the same elevation, and every flag moves to env_cleared."""
    from bench import ab_control

    prev = {"_round": 9, "git_sha": "deadbeef", "queries": {}}
    flags = [
        {"query": f"q{i}", "scope": "sf0.1", "prev_sec": 1.0,
         "now_sec": 1.4, "delta_pct": 40.0}
        for i in range(15)
    ]
    old_times = {f"/sf::q{i}": 1.38 for i in range(15)}  # old code also slow

    def fake_retime(root, ref, names_by_dir):
        assert ref == "deadbeef"
        assert names_by_dir == {"/sf": [f"q{i}" for i in range(15)]}
        return old_times

    kept, cleared = ab_control(
        str(tmp_path), prev, flags, {"sf0.1": "/sf"}, retime=fake_retime
    )
    assert kept == []
    assert len(cleared) == 15
    assert all(c["old_code_now_sec"] == 1.38 for c in cleared)


def test_ab_control_keeps_code_regressions_and_small_storms(tmp_path):
    from bench import WIDE_FLAG_N, ab_control, split_env_flags

    # below the storm threshold: no A/B, flags pass through
    few = [{"query": "q0", "scope": "sf1", "prev_sec": 1.0,
            "now_sec": 1.4, "delta_pct": 40.0}]
    assert len(few) < WIDE_FLAG_N
    kept, cleared = ab_control(
        str(tmp_path), {"git_sha": "x"}, few, {"sf1": "/sf"},
        retime=lambda *a: (_ for _ in ()).throw(AssertionError("no A/B")),
    )
    assert kept == few and cleared == []

    # mixed storm: old code reproduces 4 of 5 -> 1 genuine flag survives
    flags = [
        {"query": f"q{i}", "scope": "sf1", "prev_sec": 1.0,
         "now_sec": 1.4, "delta_pct": 40.0}
        for i in range(5)
    ]
    old = {f"/sf::q{i}": 1.35 for i in range(4)}
    old["/sf::q4"] = 1.02  # old code is FINE here: q4 is a code regression
    kept, cleared = split_env_flags(flags, old, {"sf1": "/sf"})
    assert [k["query"] for k in kept] == ["q4"]
    assert len(cleared) == 4

    # no usable measurements (worktree failed): keep everything
    kept, cleared = ab_control(
        str(tmp_path), {"git_sha": "x"}, flags, {"sf1": "/sf"},
        retime=lambda *a: {},
    )
    assert kept == flags and cleared == []


def test_ab_control_unchanged_code_flag_triggers_targeted_retime(tmp_path):
    """The r11 sub-threshold trigger: a storm-free flag whose defining
    module is byte-identical to the previous round's code gets an A/B
    retime of JUST that entry — env-reproduced flags clear, genuine ones
    (and changed-code flags, which the cheap signal skips) pass
    through."""
    from bench import WIDE_FLAG_N, ab_control

    flags = [
        {"query": "q_same", "scope": "sf0.1", "prev_sec": 1.0,
         "now_sec": 1.4, "delta_pct": 40.0},
        {"query": "q_changed", "scope": "sf0.1", "prev_sec": 1.0,
         "now_sec": 1.5, "delta_pct": 50.0},
    ]
    assert len(flags) < WIDE_FLAG_N
    seen = {}

    def fake_retime(root, ref, names_by_dir):
        seen["names"] = names_by_dir
        return {"/sf::q_same": 1.39}  # old code reproduces the slowdown

    kept, cleared = ab_control(
        str(tmp_path), {"git_sha": "abc123"}, flags, {"sf0.1": "/sf"},
        retime=fake_retime,
        unchanged=lambda root, ref, name: name == "q_same",
    )
    # only the unchanged entry was retimed, and it cleared as env
    assert seen["names"] == {"/sf": ["q_same"]}
    assert [k["query"] for k in kept] == ["q_changed"]
    assert [c["query"] for c in cleared] == ["q_same"]
    assert cleared[0]["old_code_now_sec"] == 1.39

    # unchanged-signal misses everything -> no retime, flags untouched
    kept, cleared = ab_control(
        str(tmp_path), {"git_sha": "abc123"}, flags, {"sf0.1": "/sf"},
        retime=lambda *a: (_ for _ in ()).throw(AssertionError("no A/B")),
        unchanged=lambda root, ref, name: False,
    )
    assert kept == flags and cleared == []
