"""Pin the bench.py machine-contamination self-guard (VERDICT r13 item 1).

BENCH_r13 recorded a 19.2s throughput phantom: the machine-speed probe
pair read [0.33, 0.116] — the host ran ~3x slower during the timed passes
than after them — yet the JSON carried no machine-level flag.  bench.py
now acts on the probe pair: `probe_contaminated` flags a ratio beyond
PROBE_RATIO_MAX (direction-agnostic), main() retries the timed region
once, and `pick_attempt` chooses the number of record (first clean
attempt; else lowest wall, flagged).  These are pure functions — pinned
here without a SparkSession so the guard logic can never drift silently.
"""

import importlib.util
import os

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")
_spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


class TestProbeContaminated:
    def test_equal_probes_clean(self):
        assert not bench.probe_contaminated(0.12, 0.12)

    def test_quiet_r13_pair_clean(self):
        # the judge's clean re-run pair this session
        assert not bench.probe_contaminated(0.147, 0.116)

    def test_bench_r13_phantom_flagged(self):
        # THE reproduction: the pair that should have flagged the 19.2s
        assert bench.probe_contaminated(0.33, 0.116)

    def test_direction_agnostic(self):
        # contamination arriving mid-run (fast before, slow after) is
        # just as invalidating as draining away
        assert bench.probe_contaminated(0.116, 0.33)

    def test_ratio_exactly_at_threshold_clean(self):
        # boundary: ratio == PROBE_RATIO_MAX does not flag (strict >)
        assert not bench.probe_contaminated(1.0, bench.PROBE_RATIO_MAX)

    def test_ratio_just_over_threshold_flagged(self):
        assert bench.probe_contaminated(1.0, bench.PROBE_RATIO_MAX + 0.01)

    def test_nonpositive_probe_flagged_not_zerodivision(self):
        assert bench.probe_contaminated(0.0, 0.12)
        assert bench.probe_contaminated(0.12, 0.0)

    def test_threshold_constant_pinned(self):
        # the ~1.3 threshold VERDICT r13 mandated; changing it is a
        # deliberate decision, not a drive-by edit
        assert bench.PROBE_RATIO_MAX == pytest.approx(1.3)


class TestPickAttempt:
    @staticmethod
    def _attempt(value, contaminated):
        return {"value": value, "machine_contaminated": contaminated,
                "probe": [0.12, 0.12], "queries": {},
                "sequential_total_sec": value,
                "sequential_relational_sec": value}

    def test_single_clean_attempt(self):
        a = self._attempt(2.3, False)
        assert bench.pick_attempt([a]) is a

    def test_retry_clean_wins_over_contaminated_first(self):
        # the BENCH_r13 scenario with the guard in place: first attempt
        # contaminated (19.2s phantom), retry clean (2.3s) — retry is the
        # number of record even though both exist
        bad = self._attempt(19.211, True)
        good = self._attempt(2.263, False)
        assert bench.pick_attempt([bad, good]) is good

    def test_clean_first_attempt_needs_no_retry_preference(self):
        good = self._attempt(2.3, False)
        other = self._attempt(2.1, False)
        # first clean attempt wins even if a later one is faster — the
        # guard is about validity, not cherry-picking the fastest run
        assert bench.pick_attempt([good, other]) is good

    def test_all_contaminated_lowest_wall_flagged(self):
        worse = self._attempt(19.2, True)
        better = self._attempt(11.9, True)
        chosen = bench.pick_attempt([worse, better])
        assert chosen is better
        # the flag survives so the consumer sees the number is not of record
        assert chosen["machine_contaminated"] is True


class TestStragglerReport:
    """VERDICT r14 item 5: the concurrent pass's wall must be attributable
    to a named critical path, not inferred."""

    def test_pole_is_last_finisher_not_longest(self):
        # c runs longest (1.9s) but b FINISHES last — b is the pole,
        # because the wall ends when the last query completes
        spans = [("a", 0.0, 1.0), ("b", 1.1, 2.5), ("c", 0.1, 2.0)]
        rep = bench.straggler_report(spans)
        assert rep["pole"] == "b"
        assert rep["pole_end_sec"] == 2.5
        assert rep["pole_dur_sec"] == pytest.approx(1.4)

    def test_tail_ordered_by_end_time(self):
        spans = [("a", 0.0, 3.0), ("b", 0.0, 1.0), ("c", 0.0, 2.0),
                 ("d", 0.0, 0.5)]
        rep = bench.straggler_report(spans, top_n=3)
        assert [e["q"] for e in rep["tail"]] == ["b", "c", "a"]

    def test_empty_pass(self):
        assert bench.straggler_report([]) == {"pole": None, "tail": []}


class TestPerQueryRecord:
    """VERDICT r14 item 2: per-query timings must reach the driver's tail
    capture — a compact second-to-last line plus a merged sidecar."""

    def test_record_shape(self):
        rec = bench.per_query_record({"q1": 0.5}, 0.1, 32, False)
        assert rec["metric"] == "bench_per_query"
        assert rec["queries"] == {"q1": 0.5}
        assert rec["cpus"] == 32 and rec["sf"] == 0.1
        assert rec["machine_contaminated"] is False

    def test_line_fits_tail_capture_with_headline(self):
        # the driver keeps a ~2000-char stdout tail; the per-query line
        # plus the final headline line must both survive it for the REAL
        # bench catalog (the names are the dominant bytes — pin against
        # the actual ones so a renamed/added query that would overflow
        # the tail window fails here, not in PERF_r15)
        import json

        from dbt_demo_spark.queries import CATALOG
        timings = {name: 0.123 for name, spec in CATALOG.items()
                   if spec.bench}
        line = json.dumps(bench.per_query_record(timings, 0.1, 32, False))
        assert len(line) <= 1750, (len(line), "per-query line would "
                                   "overflow the driver's tail capture")

    def test_sidecar_merges_by_cpu_count(self, tmp_path):
        import json
        p = str(tmp_path / "BENCH_PER_QUERY.json")
        bench.write_per_query_sidecar(
            p, bench.per_query_record({"q": 1.0}, 0.1, 32, False))
        bench.write_per_query_sidecar(
            p, bench.per_query_record({"q": 2.0}, 0.1, 8, False))
        with open(p) as fh:
            data = json.load(fh)
        # both the 32- and 8-core runs survive — overwrite would lose one
        assert data["cpus_32"]["queries"]["q"] == 1.0
        assert data["cpus_8"]["queries"]["q"] == 2.0

    def test_sidecar_recovers_from_corrupt_file(self, tmp_path):
        import json
        p = str(tmp_path / "BENCH_PER_QUERY.json")
        with open(p, "w") as fh:
            fh.write("not json{")
        bench.write_per_query_sidecar(
            p, bench.per_query_record({"q": 1.0}, 0.1, 32, False))
        with open(p) as fh:
            assert json.load(fh)["cpus_32"]["queries"]["q"] == 1.0
