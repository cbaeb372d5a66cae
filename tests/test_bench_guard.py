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
