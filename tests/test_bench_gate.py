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
