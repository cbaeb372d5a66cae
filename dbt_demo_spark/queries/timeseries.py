"""Time-series reshaping over the event stream: PIVOT (long -> wide
conversion matrices) and date-spine gap-fill with forward fill (the
resample/LOCF operator every metrics warehouse needs).

Reference parity: the reference's models are long-form relational
(dbt-demo models/*.sql); these extend the engine with the two reshaping
operators its users reach for next — dbt's own ecosystem ships them as
macros (``dbt_utils.pivot``, ``dbt_utils.date_spine`` [public knowledge]),
i.e. they are squarely in-scope for a dbt-shaped engine.

Scale posture (100 TB):
  * pivot with EXPLICIT values is a single hash aggregation — one shuffle
    on the group key, map-side partial aggs, no driver-side
    distinct-values job (``.pivot(col)`` without values runs one; we
    always pass the domain).
  * the date spine is generated, not scanned: sequence() explodes
    per-key (users x days rows only), the join back to observations is
    co-partitioned with the forward-fill window (both keyed on user_id),
    so the whole gap-fill costs ONE shuffle of the tiny daily-gauge
    aggregate; the ffill window partitions on high-cardinality user_id —
    skew-safe, no global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.numeric import sql_scaled_long, scaled_long
from ..sources.events import load_events
from .catalog import query

# The event-type domain is part of the generator's contract (TESTDATA.md);
# passing it explicitly keeps the pivot single-pass at any scale.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "events_pivot_daily",
    oracle=f"""
        SELECT CAST(ts AS DATE) AS day,
               {", ".join(
                   f"SUM(CASE WHEN event_type = '{t}' THEN "
                   f"{sql_scaled_long('value')} END) / 100.0 AS {t}"
                   for t in EVENT_TYPES)}
        FROM events
        GROUP BY 1
    """,
    tags=("pivot", "A1", "F1", "X44"),
)
def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long -> wide: daily value totals pivoted to one column per event
    type (the conversion-matrix shape dashboards consume;
    ``dbt_utils.pivot`` in the reference's ecosystem).

    ``.pivot(col, values)`` with the explicit domain compiles to ONE hash
    aggregate with a CASE-projected measure per value — exactly the
    oracle's conditional-aggregation form, one shuffle on ``day``, no
    second pass to discover the domain.  Money summed as exact integer
    cents (scaled_long) and divided once, so the doubles are bit-identical
    cross-engine; a (day, type) cell with no rows is NULL in both engines
    (SUM over an empty set)."""
    ev = load_events(spark, sf_dir)
    wide = (ev.groupBy(F.to_date("ts").alias("day"))
            .pivot("event_type", list(EVENT_TYPES))
            .agg(F.sum(scaled_long(F.col("value")))))
    return wide.select(
        "day", *[(F.col(t) / 100.0).alias(t) for t in EVENT_TYPES])


@query(
    "events_gapfill_ffill",
    oracle="""
        WITH p AS (
            SELECT user_id, CAST(ts AS DATE) AS day, value,
                   row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE event_type = 'purchase'
        ),
        g AS (SELECT user_id, day, value FROM p WHERE rn = 1),
        spine AS (
            SELECT b.user_id, CAST(u.d AS DATE) AS day
            FROM (SELECT user_id, MIN(day) AS d0 FROM g GROUP BY user_id) b
            CROSS JOIN (SELECT MAX(day) AS d1 FROM g) mx,
            unnest(generate_series(b.d0, mx.d1, INTERVAL 1 DAY)) AS u(d)
        ),
        j AS (
            SELECT s.user_id, s.day, g.value,
                   g.value IS NOT NULL AS observed
            FROM spine s LEFT JOIN g USING (user_id, day)
        )
        SELECT user_id, day,
               last_value(value IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS gauge,
               observed
        FROM j
    """,
    tags=("gapfill", "spine", "window", "X45"),
)
def events_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap-fill + forward fill (LOCF): resample each user's
    purchase gauge to a dense daily grid from their first purchase to the
    corpus's last, carrying the last observed value across gap days
    (``dbt_utils.date_spine`` + the standard LOCF window idiom).

    Shapes: per-(user, day) last observation via max(struct(ts, event_id,
    value)) — one deterministic aggregate, no row_number shuffle; the
    spine is GENERATED per user with sequence() (never scanned); the left
    join back and the ffill window both key on user_id, so AQE plans them
    against the same tiny aggregate.  ``observed`` marks real vs carried
    rows.  At 100 TB the spine is users x days rows — output-sized, not
    input-sized, and every stage partitions on the high-cardinality user
    key."""
    ev = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    # last observation per (user, day): struct max is lexicographic on
    # (ts, event_id, value) — ts then event_id makes it deterministic.
    g = (ev.select("user_id", F.to_date("ts").alias("day"),
                   F.struct("ts", "event_id", "value").alias("obs"))
         .groupBy("user_id", "day")
         .agg(F.max("obs").getField("value").alias("value")))
    d1 = g.agg(F.max("day").alias("d1"))
    spine = (g.groupBy("user_id").agg(F.min("day").alias("d0"))
             .crossJoin(F.broadcast(d1))
             .select("user_id",
                     F.explode(F.sequence("d0", "d1")).alias("day")))
    j = spine.join(g, ["user_id", "day"], "left")
    ffill = Window.partitionBy("user_id").orderBy("day") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return j.select(
        "user_id", "day",
        F.last("value", ignorenulls=True).over(ffill).alias("gauge"),
        F.col("value").isNotNull().alias("observed"))
