"""As-of join (SURVEY.md §2.3 J6): for each probe row, the most recent
build row with build.ts <= probe.ts, per key.

Spark has no native ASOF JOIN. The scalable recipe here is the
union-and-carry-forward merge:

1. tag build rows 0 and probe rows 1, union them;
2. one shuffle: window partitioned by key, ordered by (ts, tag);
3. ``last(build_payload_struct, ignorenulls=True)`` carries the latest
   build row's payload forward onto every probe row (a single struct so
   all payload columns come from the SAME build row, even with NULLs);
4. filter back to probe rows.

Cost: ONE shuffle of |build| + |probe| rows (the window sort), no
row-multiplication, no range explosion — this is the plan a
merge-join-based engine (DuckDB ASOF) effectively runs, expressed in
Spark operators. The naive alternative (equi-join on key + filter +
max-per-probe) multiplies rows by the per-key build count and skews on
hot keys; avoided by construction. Per-key skew here is bounded by the
window sort, which spills; for a pathological single hot key, pre-split
by time-bucketing the key before the window.

Tie semantics: build.ts == probe.ts matches (inclusive), because build
rows sort before probe rows at equal ts via the tag. This matches
DuckDB's ``ASOF JOIN ... ON probe.ts >= build.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_TS = "__asof_ts"
_PAY = "__asof_payload"


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    probe_ts: str,
    build_ts: str,
    payload: list[str],
    how: str = "left",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Return ``probe`` with ``payload`` columns from the latest ``build``
    row at-or-before each probe row's timestamp, matching on ``on`` keys.

    how='left' keeps unmatched probe rows (payload NULL); how='inner'
    drops them.

    shuffle_partitions sizes the ONE shuffle this recipe performs: an
    explicit hash repartition on the keys that the window's required
    distribution then reuses (no second exchange — asserted in
    tests/test_plans.py). The 100M-row probe (tools/scale_probe.py)
    measured 36.6 s → 25.2 s going 16 → 128 partitions at ~43M unioned
    rows: the window sort is the cost center and partition count is its
    lever. Size so each partition sorts ~100-200 MB. None = leave it to
    spark.sql.shuffle.partitions / AQE.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be 'left' or 'inner', got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    probe_cols = probe.columns
    pay_type = build.select(F.struct(*payload).alias(_PAY)).schema[0].dataType

    # a NULL build timestamp would sort nulls-first and be carried as
    # the "earliest" build row — it can never legitimately match.
    # NULL-key build rows are dropped too: Window.partitionBy groups
    # NULLs together, but SQL/DuckDB ASOF equality never matches NULL
    # keys, so a NULL-key probe must see NULL payload, not the NULL-key
    # build rows' (ADVICE r1).
    null_key_guard = F.lit(True)
    for k in ([on] if isinstance(on, str) else list(on)):
        null_key_guard = null_key_guard & F.col(k).isNotNull()
    b = build.filter(F.col(build_ts).isNotNull() & null_key_guard).select(
        *keys,
        F.col(build_ts).alias(_TS),
        F.struct(*payload).alias(_PAY),
        F.lit(0).alias(_TAG),
        *[
            F.lit(None).cast(probe.schema[c].dataType).alias(c)
            for c in probe_cols
            if c not in keys
        ],
    )
    p = probe.select(
        *probe_cols,
        F.col(probe_ts).alias(_TS),
        F.lit(None).cast(pay_type).alias(_PAY),
        F.lit(1).alias(_TAG),
    )
    unioned = p.unionByName(b)
    if shuffle_partitions is not None:
        unioned = unioned.repartition(shuffle_partitions, *keys)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *probe_cols,
        _TAG,
        F.last(_PAY, ignorenulls=True).over(w).alias(_PAY),
    )
    probes = carried.filter(F.col(_TAG) == 1)
    if how == "inner":
        # carried payload is NULL iff no build row preceded this probe row
        probes = probes.filter(F.col(_PAY).isNotNull())
    return probes.select(
        *probe_cols, *[F.col(f"{_PAY}.{c}").alias(c) for c in payload]
    )


def pit_enrich(
    probe: DataFrame,
    builds: list[tuple[DataFrame, str, list[str]]],
    on: str | list[str],
    probe_ts: str,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Point-in-time (feature-store) enrichment: attach, to each probe
    ("observation") row, the latest at-or-before payload from EVERY
    feature stream in ``builds`` — in ONE union + ONE window pass.

    This is the training-set assembly join feature stores do (label
    rows enriched with as-of-correct feature values — no leakage from
    the future). N separate :func:`asof_join` calls would shuffle the
    probe N times; here all streams are tagged, unioned, and carried
    forward under a single window, so the cost is one shuffle of
    |probe| + Σ|build_i| rows regardless of how many feature families
    ride along. Same tie semantics as asof_join (build.ts == probe.ts
    matches: builds sort before probes at equal ts via the tag).

    ``builds``: list of ``(df, ts_col, payload_cols)``; payload column
    names must be globally unique across streams (they become output
    columns). Left-join semantics: probes with no preceding feature row
    get NULLs for that stream's payload.
    """
    keys = [on] if isinstance(on, str) else list(on)
    probe_cols = probe.columns
    pay_names = [f"{_PAY}{i}" for i in range(len(builds))]
    pay_types = [
        df.select(F.struct(*cols).alias("s")).schema[0].dataType
        for df, _, cols in builds
    ]

    def _null_pays(except_i: int | None):
        return [
            (
                F.lit(None).cast(pay_types[i]).alias(pay_names[i])
                if i != except_i
                else F.struct(*builds[i][2]).alias(pay_names[i])
            )
            for i in range(len(builds))
        ]

    parts = []
    for i, (bdf, bts, _cols) in enumerate(builds):
        guard = F.col(bts).isNotNull()
        for k in keys:
            guard = guard & F.col(k).isNotNull()
        parts.append(
            bdf.filter(guard).select(
                *keys,
                F.col(bts).alias(_TS),
                *_null_pays(i),
                F.lit(0).alias(_TAG),
                *[
                    F.lit(None).cast(probe.schema[c].dataType).alias(c)
                    for c in probe_cols
                    if c not in keys
                ],
            )
        )
    p = probe.select(
        *probe_cols, F.col(probe_ts).alias(_TS), *_null_pays(None), F.lit(1).alias(_TAG)
    )
    unioned = p
    for part in parts:
        unioned = unioned.unionByName(part)
    if shuffle_partitions is not None:
        unioned = unioned.repartition(shuffle_partitions, *keys)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *probe_cols,
        _TAG,
        *[
            F.last(pn, ignorenulls=True).over(w).alias(pn)
            for pn in pay_names
        ],
    )
    out_cols = list(probe_cols)
    for i, (_df, _ts, cols) in enumerate(builds):
        out_cols += [F.col(f"{pay_names[i]}.{c}").alias(c) for c in cols]
    return carried.filter(F.col(_TAG) == 1).select(*out_cols)
