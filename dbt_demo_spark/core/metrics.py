"""Semantic-layer-lite — dbt metrics in the MetricFlow YAML shape
[public knowledge: dbt-core semantic_models / metrics specs; MetricFlow
queries compile metrics + dimensions + time grain into SQL].

The reference ships no metrics (it predates the semantic layer), but a
porting user's project grows one immediately; this is the subset that
covers the overwhelmingly common shapes:

  * ``semantic_models``: name, ``model: ref('x')``, measures
    (sum / count / count_distinct / avg / min / max over an ``expr``,
    default the measure name), dimensions (categorical, or time with a
    grain), optional ``agg_time_dimension`` default.
  * ``metrics``: ``type: simple`` (one measure, optional ``filter`` —
    a SQL predicate applied pre-aggregation to THAT metric's rows only)
    and ``type: derived`` (an ``expr`` over other metric names).
  * ``MetricLayer.query(relations, metrics, group_by, grain)`` —
    compiles to ONE Spark aggregation over the owning model: grouped by
    the requested dimensions (time dims truncated to ``grain``),
    filtered measures via conditional aggregation (CASE WHEN inside the
    agg — no per-metric scans), derived metrics as column expressions
    over the aggregated frame.  At 100 TB this is exactly the one
    shuffle the question needs; nothing materializes per metric.

Cross-model metric sets (X84): two semantic models sharing a declared
ENTITY compile to one aggregation per model at the requested grain plus
ONE full-outer join of the (tiny) aggregated frames — MetricFlow's core
move, measure-safe because measures never ride a fact-to-fact join.

Lite scope (raise, never guess): at most TWO semantic models per
request, the pair must share an entity, and derived metrics may
reference only simple metrics (one level).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_AGGS = {
    "sum": F.sum, "count": F.count, "avg": F.avg,
    "min": F.min, "max": F.max,
    "count_distinct": F.countDistinct,
}

_REF_RE = re.compile(r"ref\(\s*'([^']+)'\s*\)")


@dataclass(frozen=True)
class Measure:
    name: str
    agg: str
    expr: str  # SQL expression over the model's columns


@dataclass(frozen=True)
class Dimension:
    name: str
    type: str          # "categorical" | "time"
    expr: str
    grain: str = ""    # declared default granularity (time dims)


@dataclass(frozen=True)
class Entity:
    """MetricFlow entity [public knowledge: semantic models declare
    primary/foreign/unique entities — the join keys of the semantic
    graph].  ``expr`` is the key column/expression on this model."""
    name: str
    type: str          # "primary" | "foreign" | "unique"
    expr: str


@dataclass(frozen=True)
class SemanticModel:
    name: str
    model: str         # relation name the measures aggregate over
    measures: dict[str, Measure]
    dimensions: dict[str, Dimension]
    entities: dict[str, Entity] = field(default_factory=dict)


@dataclass(frozen=True)
class Metric:
    name: str
    type: str                   # "simple" | "derived" | "ratio" |
                                # "cumulative"
    measure: str = ""           # simple / cumulative
    filter: str = ""            # simple: pre-agg SQL predicate
    expr: str = ""              # derived: over other metric names
    label: str = ""
    numerator: str = ""         # ratio (X90): simple metric names
    denominator: str = ""
    window: str = ""            # cumulative (X90): "" = since ever,
                                # else "N unit" (unit == query grain);
                                # conversion (X93): "" = ever-after,
                                # else "N unit" after the base event
    grain_to_date: str = ""     # cumulative (X90 extension, r12): the
                                # accumulation RESETS at each boundary
                                # of this grain (month-to-date etc.);
                                # mutually exclusive with window
    entity: str = ""            # conversion (X93): join entity
    calculation: str = ""       # conversion: "conversions" |
                                # "conversion_rate"
    base_measure: str = ""      # conversion: locates base events
    conversion_measure: str = ""
    conversion_filter: str = ""  # lite extension: SQL predicate on the
                                 # conversion model's rows (stands in
                                 # for a filtered semantic model)
    attribution: str = "last_touch"  # conversion (r14, ADVICE r13):
                                 # "last_touch" (MetricFlow semantics —
                                 # each conversion EVENT attributed to
                                 # the MOST RECENT in-window base
                                 # event, counting conversion events) |
                                 # "earliest_touch" (the r13 deviation,
                                 # renamed from first_touch: earliest
                                 # base, counts DISTINCT attributed
                                 # base events) | "unattributed" (the
                                 # pre-r13 lite opt-out: one conversion
                                 # event may convert several base
                                 # events).  "first_touch" is rejected
                                 # with a migration error — its r13
                                 # behavior was earliest_touch while
                                 # claiming MetricFlow parity.
    # X100 [public MetricFlow surface: measure-input properties on
    # simple metrics — fill_nulls_with: <literal> and
    # join_to_timespine: true].  fill_nulls_with replaces NULL metric
    # values (a period with no rows) in the final projection;
    # join_to_timespine first materializes the MISSING periods as rows
    # (a generated date spine over [min, max] of the queried frame —
    # this engine generates the spine with sequence() instead of
    # requiring a time-spine model, the lite stand-in documented here)
    fill_nulls_with: object = None
    join_to_timespine: bool = False


@dataclass(frozen=True)
class SavedQuery:
    """dbt saved_queries [public knowledge: dbt saved queries name a
    reusable metric request]: the (metrics, group_by, grain) triple."""
    name: str
    metrics: tuple[str, ...]
    group_by: tuple[str, ...] = ()
    grain: str = ""


@dataclass
class MetricLayer:
    semantic_models: dict[str, SemanticModel] = field(default_factory=dict)
    metrics: dict[str, Metric] = field(default_factory=dict)
    saved_queries: dict[str, SavedQuery] = field(default_factory=dict)

    # -- resolution ------------------------------------------------------

    def _owner(self, measure: str) -> SemanticModel:
        owners = [sm for sm in self.semantic_models.values()
                  if measure in sm.measures]
        if not owners:
            raise ValueError(f"unknown measure {measure!r}")
        return owners[0]

    def _simple_closure(self, names: list[str]) -> list[Metric]:
        """The simple metrics a request needs, derived metrics expanded
        one level (dbt: derived metrics reference METRICS)."""
        out: dict[str, Metric] = {}
        for n in names:
            m = self.metrics.get(n)
            if m is None:
                raise ValueError(f"unknown metric {n!r} "
                                 f"(defined: {sorted(self.metrics)})")
            if m.type == "simple":
                out[n] = m
            elif m.type == "ratio":
                # X90: both legs must be SIMPLE metrics (one level)
                for dep in (m.numerator, m.denominator):
                    d = self.metrics.get(dep)
                    if d is None or d.type != "simple":
                        raise ValueError(
                            f"ratio metric {n!r}: "
                            f"numerator/denominator {dep!r} must be a "
                            "defined SIMPLE metric")
                    out[dep] = d
            elif m.type == "cumulative":
                # X90: the per-grain-bucket PARTIAL aggregates like a
                # simple metric under the cumulative metric's own name;
                # query() layers the running window on top
                out[n] = Metric(name=n, type="simple",
                                measure=m.measure, filter=m.filter)
            else:
                for dep in _metric_names(m.expr, self.metrics):
                    d = self.metrics[dep]
                    if d.type != "simple":
                        raise ValueError(
                            f"derived metric {n!r} references "
                            f"non-simple {dep!r} — lite scope is one "
                            "level over simple metrics")
                    out[dep] = d
        return list(out.values())

    # -- the query -------------------------------------------------------

    def _dim_col(self, sm: SemanticModel, g: str, grain: str | None):
        """Resolve one group_by name on one semantic model: a declared
        dimension, or a declared ENTITY (grouping by the join key
        itself).  Raises if neither."""
        d = sm.dimensions.get(g)
        if d is not None:
            col = F.expr(d.expr)
            if d.type == "time":
                g_grain = grain or d.grain
                if g_grain:
                    col = F.date_trunc(g_grain, col).cast("date")
            return col.alias(g)
        e = sm.entities.get(g)
        if e is not None:
            return F.expr(e.expr).alias(g)
        raise ValueError(
            f"unknown dimension {g!r} on {sm.name!r} "
            f"(defined: {sorted(sm.dimensions)}; "
            f"entities: {sorted(sm.entities)})")

    def _aggregate(self, sm: SemanticModel, relations: dict,
                   simples: list[Metric], group_by: list[str],
                   grain: str | None) -> DataFrame:
        """ONE aggregation of one semantic model's relation at the
        requested dimension grain — the only shuffle that model pays."""
        if sm.model not in relations:
            raise KeyError(
                f"semantic model {sm.name!r} needs relation {sm.model!r}")
        df = relations[sm.model]
        dims = [self._dim_col(sm, g, grain) for g in group_by]
        aggs = []
        for m in simples:
            meas = sm.measures[m.measure]
            expr = F.expr(meas.expr)
            if m.filter:
                # conditional aggregation: the filter narrows THIS
                # metric's rows without a second scan of the model
                expr = F.when(F.expr(m.filter), expr)
            aggs.append(_AGGS[meas.agg](expr).alias(m.name))
        return df.groupBy(*dims).agg(*aggs) if dims else df.agg(*aggs)

    def query(self, relations: dict[str, DataFrame], metrics: list[str],
              group_by: list[str] = (), grain: str | None = None
              ) -> DataFrame:
        """One aggregation per involved semantic model answering the
        metric question; column names are the metric / dimension names.

        Cross-model metric sets (X84, VERDICT r10 item 6 — MetricFlow's
        core move): when the simple-metric closure spans TWO semantic
        models that share an ENTITY, each model aggregates to the
        requested dimension grain independently (one shuffle each, over
        its own relation — measures never ride a fact-to-fact join, so
        no fan-out double counting), and the two aggregated frames FULL
        OUTER join on the dimension values (null-safe, coalesced) —
        months present on only one side still appear, which is also
        what the dbt-style combined rollups do.  Derived metrics may
        reference simple metrics from either side (they compute after
        the join).  Lite errors retained: >2 models, or two models with
        NO shared entity, raise — that's a genuinely unjoinable set,
        not a guessable one."""
        conv = [n for n in metrics
                if self.metrics.get(n) is not None
                and self.metrics[n].type == "conversion"]
        if conv:
            # X93: a conversion metric is an EVENT-LEVEL question (did a
            # conversion follow each base event?), not a grain
            # aggregation — it composes its own two-sided plan, so the
            # lite layer answers it alone
            if len(metrics) != 1:
                raise ValueError(
                    "conversion metrics compile to their own event-level "
                    f"join — query {conv[0]!r} by itself")
            return self._conversion_query(self.metrics[conv[0]],
                                          relations, list(group_by),
                                          grain)
        simples = self._simple_closure(list(metrics))
        owners: dict[str, list[Metric]] = {}
        for m in simples:
            owners.setdefault(self._owner(m.measure).name, []).append(m)
        if len(owners) > 2:
            raise ValueError(
                f"metrics span semantic models {sorted(owners)} — the "
                "lite layer joins at most two")
        if len(owners) == 1:
            sm = self.semantic_models[next(iter(owners))]
            out = self._aggregate(sm, relations, simples, list(group_by),
                                  grain)
        else:
            (na, ma), (nb, mb) = sorted(owners.items())
            a, b = self.semantic_models[na], self.semantic_models[nb]
            shared = set(a.entities) & set(b.entities)
            if not shared:
                raise ValueError(
                    f"metrics span {na!r} and {nb!r}, which share no "
                    "entity — declare the join key on both semantic "
                    "models (entities:) or query them separately")
            fa = self._aggregate(a, relations, ma, list(group_by), grain)
            fb = self._aggregate(b, relations, mb, list(group_by), grain)
            if group_by:
                cond = None
                for g in group_by:
                    c = fa[g].eqNullSafe(fb[g])
                    cond = c if cond is None else (cond & c)
                joined = fa.join(fb, cond, "full_outer")
                out = joined.select(
                    *[F.coalesce(fa[g], fb[g]).alias(g) for g in group_by],
                    *[fa[m.name] for m in ma],
                    *[fb[m.name] for m in mb])
            else:
                out = fa.crossJoin(fb)   # two single-row frames
        if any(self.metrics[n].join_to_timespine for n in metrics
               if self.metrics.get(n) is not None):
            out = self._join_timespine(out, list(group_by), grain)
            # fill BEFORE the final projection so a derived metric's
            # expr sees the filled values on spine rows, as MetricFlow
            # computes derived metrics over filled inputs
            for m in simples:
                if m.fill_nulls_with is not None and m.name in out.columns:
                    out = out.withColumn(
                        m.name, F.coalesce(F.col(m.name),
                                           F.lit(m.fill_nulls_with)))
        final = [F.col(g) for g in group_by]
        for n in metrics:
            m = self.metrics[n]
            if m.type == "derived":
                final.append(F.expr(m.expr).alias(n))
            elif m.type == "ratio":
                # X90: post-agg division — Spark's non-ANSI divide
                # yields NULL on a zero denominator, which is the
                # MetricFlow-rendered SQL's NULLIF behavior too
                final.append((F.col(m.numerator).cast("double")
                              / F.col(m.denominator)).alias(n))
            elif m.type == "cumulative":
                final.append(self._cumulative_col(
                    m, list(group_by), grain).alias(n))
            else:
                col = F.col(n)
                if m.fill_nulls_with is not None:
                    # X100: a period with no contributing rows reports
                    # the declared literal instead of NULL
                    col = F.coalesce(col, F.lit(m.fill_nulls_with))
                final.append(col.alias(n))
        return out.select(*final)

    def _join_timespine(self, out: DataFrame, group_by: list[str],
                        grain: str | None) -> DataFrame:
        """X100 join_to_timespine: materialize the MISSING periods of
        the queried window as rows, so downstream fill_nulls_with can
        report explicit zeros.  MetricFlow joins a project-declared
        time-spine MODEL; the lite stand-in GENERATES the spine with
        ``sequence(min, max, interval 1 <grain>)`` over the aggregated
        frame's own bounds — output-sized, never a fact re-scan, and a
        deterministic pure function of the data.  With extra categorical
        dimensions the spine crosses the frame's DISTINCT dim combos
        (each observed combo gets every period — the gap-fill contract);
        both frames are tiny (grain-level) so the join is broadcast-
        scale.  Raises without a time dimension to spine on."""
        tdims = [g for g in group_by
                 if any(sm.dimensions.get(g) is not None
                        and sm.dimensions[g].type == "time"
                        for sm in self.semantic_models.values())]
        if len(tdims) != 1:
            raise ValueError(
                "join_to_timespine needs exactly ONE time dimension in "
                f"group_by to spine on, found {tdims or None}")
        t = tdims[0]
        # the spine step must be the SAME grain _dim_col truncated with
        # (grain or the dimension's declared grain) — assuming 'day'
        # would emit ~29 spurious zero rows per month under a month-grain
        # dim, and an un-truncated timestamp dim would LOSE rows because
        # only midnight values match the sequence spine (ADVICE r12)
        step = grain
        if step is None:
            declared = {sm.dimensions[t].grain
                        for sm in self.semantic_models.values()
                        if sm.dimensions.get(t) is not None
                        and sm.dimensions[t].type == "time"
                        and sm.dimensions[t].grain}  # None/'' = ungrained
            if not declared:
                raise ValueError(
                    f"join_to_timespine: time dimension {t!r} has no "
                    "declared grain and the query passed none — an "
                    "un-truncated timestamp has no spine step")
            if len(declared) > 1:
                raise ValueError(
                    f"join_to_timespine: time dimension {t!r} declares "
                    f"conflicting grains {sorted(declared)} across "
                    "semantic models — pass an explicit query grain")
            step = next(iter(declared))
        if step not in ("day", "week", "month", "year"):
            raise ValueError(
                f"join_to_timespine: unsupported grain {step!r} — "
                "day | week | month | year")
        bounds = out.agg(F.min(t).alias("_lo"), F.max(t).alias("_hi"))
        spine = bounds.select(F.explode(F.expr(
            f"sequence(_lo, _hi, interval 1 {step})")).alias(t))
        others = [g for g in group_by if g != t]
        if others:
            spine = out.select(*others).distinct().crossJoin(spine)
        # the spine derives FROM `out` (bounds + dim combos), so the join
        # is a self-join — alias-qualify both sides to disambiguate
        sp, o2 = spine.alias("__spine"), out.alias("__mx")
        cond = None
        for g in group_by:
            c = F.col(f"__spine.{g}").eqNullSafe(F.col(f"__mx.{g}"))
            cond = c if cond is None else (cond & c)
        keep = [F.col(f"__spine.{g}").alias(g) for g in group_by]
        rest = [F.col(f"__mx.{c}") for c in out.columns
                if c not in group_by]
        return sp.join(o2, cond, "left_outer").select(*keep, *rest)

    # X90 cumulative metrics [public MetricFlow surface: type:
    # cumulative, optional window] — Spark-native as ONE window
    # function over the already-aggregated grain frame: no self-join,
    # no re-scan of the fact, and the running state is a single
    # partial per (other-dims, time) bucket.
    _CUM_ACC = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PERIOD_IDX = {
        "day": lambda c: F.datediff(c, F.lit("1970-01-01")),
        "week": lambda c: F.floor(
            F.datediff(c, F.lit("1970-01-05")) / 7),  # a Monday epoch
        "month": lambda c: F.year(c) * 12 + F.month(c),
        "year": lambda c: F.year(c),
    }

    # X93 conversion metrics [public MetricFlow surface: type:
    # conversion — entity, calculation, base_measure,
    # conversion_measure, window].  A BASE event converts when >= 1
    # conversion event for the same entity lands in
    # [base_ts, base_ts + window] — INCLUSIVE of the base timestamp,
    # matching MetricFlow's window start (ADVICE r11); `conversions`
    # counts converted base events, `conversion_rate` divides by all
    # base events.
    #
    # ATTRIBUTION (r14, ADVICE r13 medium): default `last_touch`
    # matches MetricFlow — each conversion EVENT is attributed to the
    # MOST RECENT base event in its window (MetricFlow's SQL:
    # first_value ... ORDER BY base ts DESC over the candidate pairs),
    # group-by dims come from that base event, and the metric counts
    # attributed CONVERSION events — two conversions inside one base's
    # window count 2.  `earliest_touch` keeps the r13 behavior under
    # an honest name (it shipped as `first_touch` mis-documented as
    # MetricFlow parity): earliest base, counting DISTINCT attributed
    # base events; `first_touch` itself now raises a migration error
    # so existing YAML cannot silently change meaning.  The pre-r13
    # lite semantics — one conversion event may convert several base
    # events of the same entity — remain as the documented opt-out
    # `attribution: unattributed`.  Scale shape (all modes): ONE
    # entity-keyed join (the range rides the equi-join condition,
    # never a cartesian); the attributed modes add a (conv-event)-
    # grain aggregate over candidate pairs — candidate-pair-sized,
    # never fact re-scans.  Metric-level `filter` narrows BASE rows
    # (same contract as simple metrics); `conversion_filter` is the
    # lite stand-in for a filtered conversion semantic model.

    def _model_time_expr(self, sm: SemanticModel) -> str:
        tds = [d for d in sm.dimensions.values() if d.type == "time"]
        if len(tds) != 1:
            raise ValueError(
                f"conversion metrics need exactly ONE time dimension on "
                f"semantic model {sm.name!r} to order events, found "
                f"{[d.name for d in tds] or None}")
        return tds[0].expr

    def _conversion_query(self, m: Metric, relations: dict,
                          group_by: list[str], grain: str | None
                          ) -> DataFrame:
        base_sm = self._owner(m.base_measure)
        conv_sm = self._owner(m.conversion_measure)
        for sm, meas in ((base_sm, m.base_measure),
                         (conv_sm, m.conversion_measure)):
            if sm.measures[meas].agg != "count":
                raise ValueError(
                    f"conversion metric {m.name!r}: measure {meas!r} "
                    f"must be a count (events), got "
                    f"{sm.measures[meas].agg!r}")
        if m.calculation not in ("conversions", "conversion_rate"):
            raise ValueError(
                f"conversion metric {m.name!r}: calculation must be "
                f"conversions | conversion_rate, got {m.calculation!r}")
        for sm in (base_sm, conv_sm):
            if m.entity not in sm.entities:
                raise ValueError(
                    f"conversion metric {m.name!r}: entity {m.entity!r} "
                    f"not declared on semantic model {sm.name!r}")
            if sm.model not in relations:
                raise KeyError(
                    f"semantic model {sm.name!r} needs relation "
                    f"{sm.model!r}")
        base = relations[base_sm.model]
        if m.filter:
            base = base.where(F.expr(m.filter))
        conv = relations[conv_sm.model]
        if m.conversion_filter:
            conv = conv.where(F.expr(m.conversion_filter))
        dims = [self._dim_col(base_sm, g, grain) for g in group_by]
        bb = base.select(
            F.expr(base_sm.entities[m.entity].expr).alias("__ent"),
            F.expr(self._model_time_expr(base_sm)).alias("__bts"),
            *dims)
        cc = conv.select(
            F.expr(conv_sm.entities[m.entity].expr).alias("__cent"),
            F.expr(self._model_time_expr(conv_sm)).alias("__cts"))
        cond = (bb["__ent"] == cc["__cent"]) & (cc["__cts"] >= bb["__bts"])
        if m.window:
            try:
                count_s, unit = m.window.split()
                cond = cond & (
                    cc["__cts"] <= bb["__bts"]
                    + F.expr(f"INTERVAL {int(count_s)} "
                             f"{unit.rstrip('s')}"))
            except ValueError:
                raise ValueError(
                    f"conversion metric {m.name!r}: window "
                    f"{m.window!r} — expected 'N unit'") from None
        gcols = [F.col(g) for g in group_by]
        if m.attribution == "last_touch":
            # MetricFlow semantics (r14, ADVICE r13): each conversion
            # EVENT attributes to the MOST RECENT in-window base event
            # (MetricFlow's generated SQL: first_value over the
            # candidate pairs ordered by base ts DESC), its group-by
            # dims come from THAT base event, and the metric counts
            # attributed conversion EVENTS — two conversions inside one
            # base's window count 2.  The conversion frame is
            # pre-aggregated to (entity, ts, n_events) so identical
            # duplicate conversion rows each count while the candidate
            # join stays (conv-grain x candidate-bases)-sized; a
            # (conv-event)-grain MAX over the (base_ts, dims) struct
            # picks the last touch (struct comparison is lexicographic,
            # so base_ts leads; exact-ts ties break on the
            # lexicographically largest dim tuple — a deterministic
            # stand-in for MetricFlow's arbitrary row_number pick).
            cgrain = (cc.groupBy("__cent", "__cts")
                      .agg(F.count(F.lit(1)).alias("__n")))
            cond_g = (bb["__ent"] == cgrain["__cent"]) \
                & (cgrain["__cts"] >= bb["__bts"])
            if m.window:
                count_s, unit = m.window.split()
                cond_g = cond_g & (
                    cgrain["__cts"] <= bb["__bts"]
                    + F.expr(f"INTERVAL {int(count_s)} "
                             f"{unit.rstrip('s')}"))
            battr = F.struct(F.col("__bts"),
                             *[F.col(g) for g in group_by])
            attributed = (
                cgrain.join(bb, cond_g, "inner")
                .groupBy("__cent", "__cts")
                .agg(F.max(battr).alias("__b"),
                     F.min("__n").alias("__n"))  # constant per group
                .select("__n", "__b.*"))
            converted = (attributed.groupBy(*gcols)
                         .agg(F.sum("__n").alias("__conv")))
        elif m.attribution == "earliest_touch":
            # The r13 behavior, renamed (it shipped as `first_touch`
            # claiming MetricFlow parity; it is a documented DEVIATION):
            # each conversion event attributes to the EARLIEST in-window
            # base event (struct-MIN: base_ts leads, dim values break
            # exact-ts ties), then the metric counts DISTINCT attributed
            # BASE events — a base counts once however many conversions
            # attribute to it, and identical duplicate base rows
            # collapse to one attribution target.
            battr = F.struct(F.col("__bts"),
                             *[F.col(g) for g in group_by])
            attributed = (
                cc.join(bb, cond, "inner")
                .groupBy("__cent", "__cts")
                .agg(F.min(battr).alias("__b"))
                .select("__cent", "__b.*")
                .distinct())
            converted = (attributed.groupBy(*gcols)
                         .agg(F.count(F.lit(1)).alias("__conv")))
        else:
            converted = (bb.join(cc, cond, "left_semi")
                         .groupBy(*gcols)
                         .agg(F.count(F.lit(1)).alias("__conv")))
        totals = bb.groupBy(*gcols).agg(F.count(F.lit(1)).alias("__base"))
        if group_by:
            jcond = None
            for g in group_by:
                c = totals[g].eqNullSafe(converted[g])
                jcond = c if jcond is None else (jcond & c)
            joined = totals.join(converted, jcond, "left_outer")
            keep = [totals[g].alias(g) for g in group_by]
        else:
            joined = totals.crossJoin(converted)
            keep = []
        n_conv = F.coalesce(converted["__conv"], F.lit(0))
        out_col = (n_conv if m.calculation == "conversions"
                   else n_conv.cast("double") / totals["__base"])
        return joined.select(*keep, out_col.alias(m.name))

    def _time_dim(self, group_by: list[str]) -> str:
        """The single time dimension a cumulative metric orders by."""
        tdims = [g for g in group_by
                 if any(sm.dimensions.get(g) is not None
                        and sm.dimensions[g].type == "time"
                        for sm in self.semantic_models.values())]
        if len(tdims) != 1:
            raise ValueError(
                "cumulative metrics need exactly ONE time dimension in "
                f"group_by to order the accumulation, got {tdims or None}")
        return tdims[0]

    def _cumulative_col(self, m: Metric, group_by: list[str],
                        grain: str | None):
        from pyspark.sql import Window

        meas = self._owner(m.measure).measures[m.measure]
        if meas.agg not in self._CUM_ACC:
            raise ValueError(
                f"cumulative metric {m.name!r}: measure agg "
                f"{meas.agg!r} cannot accumulate from per-bucket "
                f"partials — supported: {sorted(self._CUM_ACC)}")
        tdim = self._time_dim(group_by)
        part = [g for g in group_by if g != tdim]
        acc = self._CUM_ACC[meas.agg]
        if m.grain_to_date:
            # period-to-date [public MetricFlow surface: grain_to_date]:
            # accumulation restarts at each boundary of the named grain
            # — an extra PARTITION key (the truncated time dim), still
            # one window function over the grain frame
            if m.window:
                raise ValueError(
                    f"cumulative metric {m.name!r}: window and "
                    "grain_to_date are mutually exclusive")
            if m.grain_to_date.rstrip("s") not in self._PERIOD_IDX:
                raise ValueError(
                    f"cumulative metric {m.name!r}: grain_to_date "
                    f"{m.grain_to_date!r} — expected one of "
                    f"{sorted(self._PERIOD_IDX)}")
            boundary = F.date_trunc(m.grain_to_date.rstrip("s"),
                                    F.col(tdim))
            w = (Window.partitionBy(*part, boundary)
                 .orderBy(F.col(tdim))
                 .rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))
            return acc(F.col(m.name)).over(w)
        if not m.window:
            w = (Window.partitionBy(*part).orderBy(F.col(tdim))
                 .rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))
            return acc(F.col(m.name)).over(w)
        try:
            count_s, unit = m.window.split()
            count = int(count_s)
            unit = unit.rstrip("s")
            idx_fn = self._PERIOD_IDX[unit]
        except (ValueError, KeyError):
            raise ValueError(
                f"cumulative metric {m.name!r}: window {m.window!r} — "
                f"expected 'N unit' with unit in "
                f"{sorted(self._PERIOD_IDX)}") from None
        # RANGE over a period index keeps gaps honest (a missing bucket
        # still ages out of the trailing window); that only means
        # "trailing N periods" when the buckets ARE that period, so the
        # effective grain must equal the window unit
        eff = grain or next(
            sm.dimensions[tdim].grain
            for sm in self.semantic_models.values()
            if sm.dimensions.get(tdim) is not None)
        if (eff or "").rstrip("s") != unit:
            raise ValueError(
                f"cumulative metric {m.name!r}: window unit {unit!r} "
                f"must equal the query grain {eff!r} — a trailing "
                "window over mismatched buckets would mix periods")
        w = (Window.partitionBy(*part).orderBy(idx_fn(F.col(tdim)))
             .rangeBetween(-(count - 1), 0))
        return acc(F.col(m.name)).over(w)

    def run_saved(self, name: str,
                  relations: dict[str, DataFrame]) -> DataFrame:
        """Execute a saved query by name."""
        sq = self.saved_queries.get(name)
        if sq is None:
            raise ValueError(f"unknown saved query {name!r} "
                             f"(defined: {sorted(self.saved_queries)})")
        return self.query(relations, list(sq.metrics),
                          group_by=list(sq.group_by),
                          grain=sq.grain or None)


def _metric_names(expr: str, metrics: dict[str, Metric]) -> list[str]:
    """Metric names appearing as identifiers in a derived expr."""
    idents = re.findall(r"[A-Za-z_][A-Za-z0-9_]*", expr)
    return [i for i in dict.fromkeys(idents) if i in metrics]


def parse_metric_layer(path_or_text: str) -> MetricLayer:
    """The dbt semantic-layer YAML shapes -> a MetricLayer."""
    import yaml

    if os.path.exists(path_or_text):
        with open(path_or_text) as fh:
            doc = yaml.safe_load(fh)
    else:
        doc = yaml.safe_load(path_or_text)
    doc = doc or {}
    layer = MetricLayer()
    for s in doc.get("semantic_models", []) or []:
        measures = {}
        for m in s.get("measures", []) or []:
            measures[m["name"]] = Measure(
                name=m["name"], agg=m["agg"],
                expr=str(m.get("expr", m["name"])))
            if m["agg"] not in _AGGS:
                raise ValueError(
                    f"measure {m['name']!r}: unsupported agg {m['agg']!r}"
                    f" — supported: {sorted(_AGGS)}")
        dims = {}
        for d in s.get("dimensions", []) or []:
            dims[d["name"]] = Dimension(
                name=d["name"], type=d.get("type", "categorical"),
                expr=str(d.get("expr", d["name"])),
                grain=((d.get("type_params", {}) or {})
                       .get("time_granularity", "")))
        entities = {}
        for e in s.get("entities", []) or []:
            entities[e["name"]] = Entity(
                name=e["name"], type=e.get("type", "primary"),
                expr=str(e.get("expr", e["name"])))
        model_token = s.get("model", s["name"])
        m = _REF_RE.search(model_token)
        layer.semantic_models[s["name"]] = SemanticModel(
            name=s["name"], model=m.group(1) if m else model_token,
            measures=measures, dimensions=dims, entities=entities)
    for m in doc.get("metrics", []) or []:
        tp = m.get("type_params", {}) or {}

        def _name_of(v) -> str:
            return ((v or {}).get("name", "") if isinstance(v, dict)
                    else (v or ""))

        meas_in = tp.get("measure")
        meas_props = meas_in if isinstance(meas_in, dict) else {}
        layer.metrics[m["name"]] = Metric(
            name=m["name"], type=m.get("type", "simple"),
            measure=_name_of(tp.get("measure")),
            fill_nulls_with=meas_props.get("fill_nulls_with"),
            join_to_timespine=bool(meas_props.get("join_to_timespine",
                                                  False)),
            filter=str(m.get("filter") or ""),
            expr=str(tp.get("expr") or ""),
            label=m.get("label", ""),
            numerator=_name_of(tp.get("numerator")),
            denominator=_name_of(tp.get("denominator")),
            window=str(tp.get("window") or ""),
            grain_to_date=str(tp.get("grain_to_date") or ""),
            entity=str(tp.get("entity") or ""),
            calculation=str(tp.get("calculation")
                            or ("conversions"
                                if m.get("type") == "conversion" else "")),
            base_measure=_name_of(tp.get("base_measure")),
            conversion_measure=_name_of(tp.get("conversion_measure")),
            conversion_filter=str(tp.get("conversion_filter") or ""),
            attribution=str(tp.get("attribution") or "last_touch"))
    for sq in doc.get("saved_queries", []) or []:
        qp = sq.get("query_params", {}) or {}
        layer.saved_queries[sq["name"]] = SavedQuery(
            name=sq["name"], metrics=tuple(qp.get("metrics", ()) or ()),
            group_by=tuple(qp.get("group_by", ()) or ()),
            grain=qp.get("grain", "") or "")
    for m in layer.metrics.values():
        if m.type in ("simple", "cumulative") and not m.measure:
            raise ValueError(f"{m.type} metric {m.name!r} needs a measure")
        if m.type == "derived" and not m.expr:
            raise ValueError(f"derived metric {m.name!r} needs an expr")
        if m.type == "ratio" and not (m.numerator and m.denominator):
            raise ValueError(
                f"ratio metric {m.name!r} needs numerator and "
                "denominator")
        if m.type == "conversion" and not (
                m.entity and m.base_measure and m.conversion_measure):
            raise ValueError(
                f"conversion metric {m.name!r} needs entity, "
                "base_measure, and conversion_measure")
        if m.type == "conversion" and m.attribution == "first_touch":
            # r13 shipped `first_touch` documented as MetricFlow parity
            # while actually computing earliest-base/count-distinct-base
            # (ADVICE r13, medium).  Rather than silently change what an
            # existing YAML means, the old name is a hard error naming
            # both successors.
            raise ValueError(
                f"conversion metric {m.name!r}: attribution "
                "'first_touch' was renamed — use 'earliest_touch' for "
                "its old behavior (earliest base event, counts distinct "
                "attributed base events; a documented deviation from "
                "MetricFlow) or 'last_touch' (the default: MetricFlow "
                "semantics — most recent base event, counts conversion "
                "events)")
        if (m.type == "conversion"
                and m.attribution not in ("last_touch", "earliest_touch",
                                          "unattributed")):
            raise ValueError(
                f"conversion metric {m.name!r}: attribution must be "
                f"last_touch | earliest_touch | unattributed, got "
                f"{m.attribution!r}")
        if ((m.fill_nulls_with is not None or m.join_to_timespine)
                and m.type != "simple"):
            raise ValueError(
                f"metric {m.name!r}: fill_nulls_with/join_to_timespine "
                "are measure-input properties of SIMPLE metrics")
        if (m.fill_nulls_with is not None
                and not isinstance(m.fill_nulls_with, (int, float))):
            raise ValueError(
                f"metric {m.name!r}: fill_nulls_with must be a numeric "
                f"literal, got {m.fill_nulls_with!r}")
        if m.type not in ("simple", "derived", "ratio", "cumulative",
                          "conversion"):
            raise ValueError(
                f"metric {m.name!r}: unsupported type {m.type!r} — lite "
                "scope is simple | derived | ratio | cumulative | "
                "conversion")
    return layer
