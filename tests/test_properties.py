"""Property-based tests (hypothesis): the composed operators must agree
with direct pure-Python reference models on randomized small inputs —
the distributed decomposition (salting, bucketization, union+window fill)
is exactly where off-by-one boundary bugs hide, and random inputs probe
boundaries the fixture data never hits (equal timestamps at bucket edges,
single-event sessions, keys present on only one side)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=12, deadline=None,
                    suppress_health_check=[HealthCheck.too_slow])

# (key, ts) event streams: few keys -> collisions guaranteed; ts range is
# small so equal timestamps and boundary-adjacent gaps occur constantly
events_strategy = st.lists(
    st.tuples(st.integers(0, 3),            # key
              st.integers(0, 400),          # ts
              st.integers(0, 10_000)),      # unique-ifier / payload
    min_size=1, max_size=60,
)


def _ref_sessions(rows, gap):
    """Pure-python gaps-and-islands: {(key, start, end, n)}."""
    out = set()
    by_key = {}
    for k, ts, _ in rows:
        by_key.setdefault(k, []).append(ts)
    for k, tss in by_key.items():
        tss.sort()
        start = prev = tss[0]
        n = 0
        for ts in tss:
            if ts - prev > gap:
                out.add((k, start, prev, n))
                start, n = ts, 0
            n += 1
            prev = ts
        out.add((k, start, prev, n))
    return out


@SETTINGS
@given(events_strategy, st.integers(1, 50), st.integers(1, 60))
def test_salted_sessionization_property(spark, rows, gap, bucket):
    """sessionize_salted == the reference islands for ANY gap/bucket combo,
    including buckets smaller than the gap."""
    from dbt_demo_spark.operators import sessionize

    # seconds-grain events; event_id deduplicates ties deterministically
    df = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts, _) in enumerate(rows)],
        "user_id long, sec long, event_id long",
    ).selectExpr("user_id", "timestamp_seconds(sec) AS ts", "event_id")

    got = {(r.user_id,
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
            r.n_events)
           for r in sessionize.sessionize_salted(
               df, gap_s=gap, bucket_s=bucket).collect()}
    want = _ref_sessions([(k, ts, 0) for k, ts, _ in rows], gap)
    assert got == want


@SETTINGS
@given(events_strategy, events_strategy)
def test_asof_join_property(spark, lrows, rrows):
    """asof_join == per-row 'greatest right ts <= left ts' reference; right
    side deduplicated on (key, ts) per the operator contract."""
    from dbt_demo_spark.operators import asof

    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts, _) in enumerate(lrows)],
        "k long, ts long, lid long")
    rdedup = {}
    for k, ts, v in rrows:
        rdedup[(k, ts)] = max(v, rdedup.get((k, ts), -1))
    right = spark.createDataFrame(
        [(k, ts, v) for (k, ts), v in rdedup.items()],
        "k long, ts long, rv long")

    got = {(r.k, r.lid): r.rv
           for r in asof.asof_join(left, right, on="k").collect()}
    for i, (k, ts, _) in enumerate(lrows):
        cands = [(rts, v) for (rk, rts), v in rdedup.items()
                 if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[(k, i)] == want, (k, ts)


@SETTINGS
@given(events_strategy, events_strategy, st.integers(1, 100))
def test_range_join_property(spark, prows, irows, width):
    """range_join == the quadratic point-in-interval reference for any
    bucket width."""
    from dbt_demo_spark.operators import asof

    points = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts, _) in enumerate(prows)],
        "k long, p long, pid long")
    intervals = spark.createDataFrame(
        [(k, s, s + (dur % 97), 1000 + i)
         for i, (k, s, dur) in enumerate(irows)],
        "k long, s long, e long, iid long")

    got = {(r.pid, r.iid) for r in asof.range_join(
        points, intervals, on="k", point_col="p", start_col="s",
        end_col="e", bucket_width=width).collect()}
    want = {(pid, 1000 + j)
            for pid, (pk, p, _) in enumerate(prows)
            for j, (ik, s, dur) in enumerate(irows)
            if pk == ik and s <= p < s + (dur % 97)}
    assert got == want

    # auto width (bucket_width=None): grid from avg interval length —
    # same answer as every explicit width (r9's bucket-width heuristic)
    auto = {(r.pid, r.iid) for r in asof.range_join(
        points, intervals, on="k", point_col="p", start_col="s",
        end_col="e").collect()}
    assert auto == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(  # per run: {key: check_value} for a random key subset
    st.dictionaries(st.integers(0, 3), st.integers(0, 2),
                    min_size=1, max_size=4),
    min_size=2, max_size=4))
def test_snapshot_scd2_property(spark, tmp_path_factory, runs):
    """SCD2 check-strategy snapshot over a random sequence of source
    states == a pure-python version-history model: every (key, value)
    change closes exactly one version, unchanged and absent keys carry
    over, and the current set equals the union of the latest state of
    every key ever seen."""
    from dbt_demo_spark.core.snapshot import SnapshotDef, SnapshotRunner
    import pyspark.sql.functions as F

    wh = str(tmp_path_factory.mktemp("snapwh"))
    sr = SnapshotRunner(spark, wh)
    sdef = SnapshotDef("s", unique_key="k", strategy="check",
                       check_cols=("v",))

    # pure-python reference: key -> list of [from, to, v]
    ref: dict[int, list[list]] = {}
    snap = None
    for i, state in enumerate(runs):
        ts = f"2023-01-0{i + 1} 00:00:00"
        src = spark.createDataFrame(list(state.items()), "k long, v long")
        snap = sr.run(sdef, src, as_of=F.lit(ts))
        for k, v in state.items():
            versions = ref.setdefault(k, [])
            if not versions:
                versions.append([ts, None, v])
            elif versions[-1][2] != v:
                versions[-1][1] = ts
                versions.append([ts, None, v])

    got = {(r.k, str(r.dbt_valid_from),
            str(r.dbt_valid_to) if r.dbt_valid_to else None, r.v)
           for r in snap.collect()}
    want = {(k, vf, vt, v)
            for k, versions in ref.items() for vf, vt, v in versions}
    assert got == want


@SETTINGS
@given(
    st.lists(st.tuples(st.integers(0, 50),      # doc_id
                       st.integers(0, 5),       # chunk_id
                       st.integers(1, 300)),    # n_tokens (may exceed budget)
             min_size=1, max_size=60, unique_by=lambda t: (t[0], t[1])),
    st.integers(32, 256),                        # budget
    st.integers(1, 8),                           # n_shards
)
def test_pack_chunks_property(spark, chunks, budget, n_shards):
    """pack_chunks == the pure-python sharded-FFD model for ANY chunk
    mix/budget/shard count: same bin for every chunk, budget respected
    except single-oversized bins, partition-count independent."""
    from dbt_demo_spark.operators.packing import pack_chunks

    df = spark.createDataFrame(chunks, "doc_id long, chunk_id int, n_tokens int")
    got = {(r.doc_id, r.chunk_id): (r.shard, r.bin_id)
           for r in pack_chunks(df, budget, n_shards=n_shards).collect()}

    # reference: shard via the engine's own hash (pinned by one tiny query),
    # then FFD with the operator's declared order
    shard_of = {r.doc_id: r.shard for r in pack_chunks(
        df.select("doc_id").distinct()
          .withColumn("chunk_id", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(0))
          .withColumn("n_tokens", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(1)),
        budget, n_shards=n_shards).collect()}
    want = {}
    for shard in set(shard_of.values()):
        members = sorted((t for t in chunks if shard_of[t[0]] == shard),
                         key=lambda t: (-t[2], t[0], t[1]))
        bins = []
        for doc_id, chunk_id, tok in members:
            placed = -1
            for b, room in enumerate(bins):
                if room >= tok:
                    placed, bins[b] = b, room - tok
                    break
            if placed < 0:
                bins.append(max(0, budget - tok))
                placed = len(bins) - 1
            want[(doc_id, chunk_id)] = (shard, placed)

    assert got == want


@SETTINGS
@given(events_strategy, events_strategy, st.integers(1, 120))
def test_interval_join_property(spark, lrows, rrows, delay):
    """interval_join (batch form) == the pure-python interval match for
    any key/ts mix and delay: every (follow, trigger) pair with the same
    key and trigger_ts <= follow_ts <= trigger_ts + delay, multiplicity
    included."""
    import datetime as dt

    from dbt_demo_spark.streaming import interval_join

    base = dt.datetime(2024, 1, 1)

    def mk(rows, tag):
        return spark.createDataFrame(
            [(k, base + dt.timedelta(seconds=ts), f"{tag}{u}")
             for k, ts, u in rows],
            "user_id long, ts timestamp, event_type string")

    left, right = mk(lrows, "f"), mk(rrows, "t")
    got = sorted(
        (r.user_id, r.trigger_ts, r.follow_ts, r.trigger_type, r.follow_type)
        for r in interval_join(left, right, "user_id",
                               max_delay=f"{delay} seconds").collect())

    want = sorted(
        (lk, base + dt.timedelta(seconds=rts), base + dt.timedelta(seconds=lts),
         f"t{ru}", f"f{lu}")
        for lk, lts, lu in lrows
        for rk, rts, ru in rrows
        if lk == rk and rts <= lts <= rts + delay)
    assert got == want


# --- incremental dedup: batch-split invariance ------------------------------

_DOC_POOL = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs",
             "sphinx of black quartz judge my vow today",
             "how vexingly quick daft zebras jump now"]

# (pool index, mutation position, mutate?) per doc: mutations create
# near-dups whose Jaccard straddles the 0.5 threshold — the boundary the
# planted fixtures never probe
docs_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 8), st.booleans()),
    min_size=2, max_size=24)


def _mk_docs(spark, spec):
    rows = []
    for i, (p, j, mut) in enumerate(spec):
        toks = _DOC_POOL[p].split()
        if mut:
            toks[j % len(toks)] = "zzz"
        rows.append((i, " ".join(toks), "en", "src", 0))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs_strategy, st.integers(0, 23), st.integers(0, 23))
def test_incremental_dedup_batch_split_invariance(spark, tmp_path_factory,
                                                  spec, c1, c2):
    """Splitting an ingest at ANY id cut points (including empty middle
    batches) must reproduce the one-shot drop-if-matches-earlier set."""
    from dbt_demo_spark.operators import dedup

    docs = _mk_docs(spark, spec)
    n = len(spec)
    pairs = dedup.minhash_near_dups(docs, 0.5)
    oneshot = ({r.doc_id for r in docs.select("doc_id").collect()}
               - {r.d2 for r in pairs.select("d2").collect()})

    idx = str(tmp_path_factory.mktemp("incr_prop") / "idx")
    cuts = [0] + sorted({c1 % (n + 1), c2 % (n + 1)}) + [n]
    kept = set()
    for lo, hi in zip(cuts, cuts[1:]):
        batch = docs.filter(f"doc_id >= {lo} AND doc_id < {hi}")
        kept |= {r.doc_id
                 for r in dedup.incremental_minhash_dedup(batch, idx, 0.5)
                 .select("doc_id").collect()}
    assert kept == oneshot


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(0, 10**12), min_size=1, max_size=40,
                unique=True),
       st.integers(0, 10_000), st.integers(0, 10_000))
def test_source_weighted_sample_census_and_monotonic(spark, ids, t1, t2):
    """The kept set equals a pure-python census of the hash for ANY ids
    (including >2^31 — the key-magnitude class the sf1 run caught in the
    split hash), and a higher rate keeps a superset (thresholds nest)."""
    from dbt_demo_spark.queries.text_filters import (SAMPLE_GRAN,
                                                     _SAMPLE_MULT,
                                                     source_weighted_sample)
    from dbt_demo_spark.functions.text import HASH_P

    lo, hi = sorted((t1, t2))
    docs = spark.createDataFrame(
        [(i, "w w w", "en", "s", 5) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long")

    def census(thresh):
        return {i for i in ids
                if ((i % HASH_P) * _SAMPLE_MULT) % HASH_P % SAMPLE_GRAN
                < thresh}

    kept_lo = {r.doc_id for r in source_weighted_sample(
        docs, {"s": lo / SAMPLE_GRAN}).select("doc_id").collect()}
    kept_hi = {r.doc_id for r in source_weighted_sample(
        docs, {"s": hi / SAMPLE_GRAN}).select("doc_id").collect()}
    assert kept_lo == census(lo)
    assert kept_hi == census(hi)
    assert kept_lo <= kept_hi


# ---------------------------------------------------------------------------
# Passage-level exact dedup (operators/dedup.passage_dedup)
# ---------------------------------------------------------------------------

# small vocab + short docs: cross-document passage collisions guaranteed,
# ragged final windows constant, whole-doc duplicates frequent
docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=9)
    .map(" ".join),
    min_size=1, max_size=16,
)


@SETTINGS
@given(docs_strategy, st.integers(2, 4))
def test_passage_dedup_property(spark, texts, width):
    """Distributed passage dedup == the sequential reference model:
    walking docs in doc_id order, a passage survives iff its text was
    never seen before (any doc, any position), and each clean_text is the
    in-order join of its survivors (None when nothing survives)."""
    from dbt_demo_spark.operators.dedup import passage_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    seen: set[str] = set()
    expect = {}
    for i, t in rows:
        toks = t.split(" ")
        kept, total = [], 0
        for s in range(0, len(toks), width):
            p = " ".join(toks[s:s + width])
            total += 1
            if p not in seen:
                seen.add(p)
                kept.append(p)
        expect[i] = (total, len(kept), " ".join(kept) if kept else None)

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_passages, r.n_kept, r.clean_text)
           for r in passage_dedup(docs, width=width).collect()}
    assert got == expect


# ---------------------------------------------------------------------------
# Sound q-chunk edit-distance blocking (operators/dedup.py)
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@SETTINGS
@given(st.lists(st.text(alphabet="abc", min_size=8, max_size=24),
                min_size=2, max_size=10, unique=True))
def test_qchunk_edit_distance_is_sound_and_exact(spark, texts):
    """The q-chunk filter must find EVERY pair within k (soundness is the
    theorem, not a heuristic) and nothing else (verify is exact) — i.e.
    exact equality with the brute-force O(n^2) DP on random corpora."""
    from dbt_demo_spark.operators.dedup import edit_distance_near_dups_qchunk

    k = 2
    rows = list(enumerate(texts))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.d1, r.d2): r.distance
           for r in edit_distance_near_dups_qchunk(docs, k).collect()}
    want = {(i, j): _lev(a, b)
            for i, a in rows for j, b in rows
            if i < j and _lev(a, b) <= k}
    assert got == want


def test_qchunk_finds_pairs_shingle_blocking_cannot(spark):
    """The adversarial case for the shingle-blocked variant: docs too
    short to shingle (< 3 tokens) are invisible to it, while the sound
    q-chunk filter still finds their close pairs; unsound q raises."""
    import pytest

    from dbt_demo_spark.operators.dedup import (
        edit_distance_near_dups, edit_distance_near_dups_qchunk)

    docs = spark.createDataFrame(
        [(0, "abcdefghij"), (1, "abcdefghix"), (2, "zzzzzzzzzz")],
        "doc_id long, text string")
    assert edit_distance_near_dups(docs, 2).collect() == []  # no shingles
    got = {(r.d1, r.d2): r.distance
           for r in edit_distance_near_dups_qchunk(docs, 2).collect()}
    assert got == {(0, 1): 1}
    with pytest.raises(ValueError, match="unsound"):
        edit_distance_near_dups_qchunk(docs, 2, q=9)


# ------------------------------- X82 macro expansion properties ----

_IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True)
_LITERAL = st.one_of(
    st.integers(-999, 999),
    st.text(alphabet="abcxyz_ ", min_size=0, max_size=8),
    st.booleans(),
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(params=st.lists(_IDENT, min_size=1, max_size=4, unique=True),
       vals=st.lists(_LITERAL, min_size=4, max_size=4),
       sep=st.sampled_from([" + ", ", ", " || "]))
def test_macro_expansion_matches_reference_substitution(params, vals,
                                                        sep):
    """Pure-Python reference property: expanding {{ m(args...) }} over a
    body that's a separator-join of its parameter slots equals direct
    text substitution — for any parameter names, literal argument
    values, and separator.  Also exercises keyword binding on the last
    parameter and confirms expansion terminates (the r12 hang guard)."""
    from dbt_demo_spark.core.macros import (_literal_text,
                                            expand_macros,
                                            parse_macro_text)

    vals = vals[:len(params)]
    params = params[:len(vals)]
    body = sep.join("{{ %s }}" % p for p in params)
    macros = parse_macro_text(
        "{%% macro m(%s) %%}%s{%% endmacro %%}" % (", ".join(params),
                                                   body))
    arg_txt = ", ".join(repr(v) for v in vals)
    got = expand_macros("select {{ m(%s) }} as x" % arg_txt, macros)
    want = "select %s as x" % sep.join(_literal_text(v) for v in vals)
    assert got == want
    # keyword form binds the same
    kw_txt = ", ".join(
        [repr(v) for v in vals[:-1]]
        + ["%s=%r" % (params[-1], vals[-1])])
    assert expand_macros("select {{ m(%s) }} as x" % kw_txt,
                         macros) == want


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(args=st.lists(
    st.one_of(
        st.integers(-99, 99).map(repr),
        st.text(alphabet="ab,() c", min_size=0, max_size=6).map(repr),
        st.sampled_from(["ref('x')", "var('y')", "this",
                         "source('a', 'b')"]),
    ), min_size=1, max_size=5))
def test_split_args_respects_quotes_and_parens(args):
    """_split_args inverts a comma-join for any mix of quoted literals
    (including ones CONTAINING commas and parens) and call-shaped
    arguments — the grammar run_operation and every call site bind
    through."""
    from dbt_demo_spark.core.macros import _split_args

    joined = ", ".join(args)
    assert _split_args(joined) == [a.strip() for a in args]
