"""The judged bench artifact's stdout contract: one JSON line that survives
the driver's bounded (2000-char) stdout tail — the exact failure that made
the round-3 artifact unparseable (VERDICT r3 item 1). No Spark needed."""

from __future__ import annotations

import json

import bench


def _fake_result() -> dict:
    queries = {name: 123.456 for name in bench.HEADLINE}
    queries["validation_pass"] = 12.345
    queries["validation_pass_decode"] = 123.456
    warm = dict(queries)
    return {
        "metric": "headline_suite_sec",
        "value": 1234.567,
        "unit": "sec",
        "queries": queries,
        "queries_warm": warm,
        "total_excludes": sorted(bench.TOTAL_EXCLUDED),
        "sf": 0.1,
        "images_rows": 1_000_000,
        "images_validated_per_sec": 110019.8,
        "images_validated_per_sec_warm": 110019.8,
        "images_validated_per_sec_decode": 53467.0,
        "images_validated_per_sec_decode_warm": 53467.0,
        "cpus": 32,
    }


def test_stdout_line_fits_driver_tail_and_parses():
    line = bench.render_stdout_line(_fake_result())
    assert len(line) <= 1900
    parsed = json.loads(line)
    # driver-contract keys survive slimming
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed, key
    # `queries` always covers at least the summed-headline set `value`
    # is built from; the additive keys may be shed (tier 4) but then the
    # line says so and the full map lives in the committed file
    summed = {q for q in _fake_result()["queries"] if q not in bench.TOTAL_EXCLUDED}
    assert summed <= set(parsed["queries"])
    if not set(parsed["queries"]) >= set(_fake_result()["queries"]):
        assert parsed["queries_omitted_additive"] is True
    # the full record is pointed at when the warm series was dropped
    if "queries_warm" not in parsed:
        assert parsed["full_results_file"] == "BENCH_SELF.json"


def test_stdout_line_degrades_not_truncates():
    """Even an absurdly wide query set yields a parseable line under the
    limit (per-query maps dropped last, headline metrics kept)."""
    r = _fake_result()
    r["queries"] = {f"q_very_long_operator_name_{i:04d}": 1.0 for i in range(400)}
    r["queries_warm"] = dict(r["queries"])
    line = bench.render_stdout_line(r)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_sec"
    assert "images_validated_per_sec" in parsed


def test_every_headline_query_is_registered():
    """bench.HEADLINE must only name real registry entries — a renamed
    operator would otherwise crash the judged bench at runtime."""
    from al_drift_detection_spark.operators import REGISTRY

    missing = [q for q in bench.HEADLINE if q not in REGISTRY]
    assert not missing, missing
