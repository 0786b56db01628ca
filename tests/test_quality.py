"""Data-quality operator tests (dq1-dq3): the audit must FIND planted
violations (not report vacuous zeros), PSI must survive empty bins,
and freshness lag must be exact to the microsecond."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from oxi_diel_db_spark.queries import load_registry

SF = "/root/testdata/sf0.001"


def test_constraint_audit_finds_planted_violations(spark):
    reg = load_registry()
    rows = {r["constraint"]: r for r in reg["dq1_constraint_audit"].build(spark, SF).collect()}
    assert len(rows) == 6
    # deliberately-tight constraints MUST report violations
    assert rows["range_lineitem_quantity_1_40"]["n_violations"] > 0
    assert rows["enum_events_event_type"]["n_violations"] > 0
    # clean constraints MUST report zero (no false positives)
    assert rows["fk_orders_custkey"]["n_violations"] == 0
    assert rows["notnull_documents_text"]["n_violations"] == 0
    assert rows["unique_customer_custkey"]["n_violations"] == 0
    for r in rows.values():
        assert math.isclose(
            r["violation_rate"], round(r["n_violations"] / r["n_checked"], 6), abs_tol=1e-9
        )


def test_psi_handles_empty_bins(spark):
    """A half with an entirely-empty bin must yield a finite smoothed
    PSI term, never NaN/inf (the raw formula divides by zero)."""
    reg = load_registry()
    out = reg["dq2_distribution_drift"].build(spark, SF).collect()
    assert sorted(r["bin"] for r in out) == list(range(10))  # full spine
    for r in out:
        assert math.isfinite(r["psi_term"]) and math.isfinite(r["p_ref"])
        assert r["p_ref"] > 0 and r["p_cur"] > 0  # smoothing floor
    # even/odd halves of one distribution: total PSI ~ 0 (no drift)
    assert sum(r["psi_term"] for r in out) < 0.05


def test_psi_synthetic_drift_detected(spark):
    """Planted drift (cur shifted up by 3 of 10 bins) must push PSI
    over the 0.2 alert threshold when computed with the same smoothed
    formula."""
    n = 2000
    ref = spark.range(n).select((F.col("id") % 10).cast("double").alias("v"), F.lit(0).alias("half"))
    cur = spark.range(n).select(
        F.least((F.col("id") % 10) + 3, F.lit(9)).cast("double").alias("v"),
        F.lit(1).alias("half"),
    )
    u = ref.unionByName(cur)
    c = (
        u.groupBy(F.col("v").cast("int").alias("bin"))
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_cur"),
        )
        .collect()
    )
    t_ref = sum(r["n_ref"] for r in c)
    t_cur = sum(r["n_cur"] for r in c)
    psi = sum(
        ((r["n_ref"] + 1.0) / (t_ref + 10) - (r["n_cur"] + 1.0) / (t_cur + 10))
        * math.log(((r["n_ref"] + 1.0) / (t_ref + 10)) / ((r["n_cur"] + 1.0) / (t_cur + 10)))
        for r in c
    )
    assert psi > 0.2


def test_freshness_lag_zero_for_freshest(spark):
    reg = load_registry()
    out = reg["dq3_freshness_lag"].build(spark, SF).collect()
    lags = sorted(r["hours_behind"] for r in out)
    assert lags[0] == 0.0  # the freshest stream lags itself by zero
    assert all(v >= 0 for v in lags)


def test_session_window_semantics(spark):
    """q85's gap semantics on a hand-built stream: events 10 min apart
    merge, a > gap hole splits, end = last event + gap."""
    from oxi_diel_db_spark.queries import REGISTRY

    e = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:10:00", 2.0),
            (1, "2024-01-01 13:00:00", 4.0),
            (2, "2024-01-01 01:00:00", 8.0),
        ],
        "user_id long, ts string, value double",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = (
        e.groupBy(F.session_window("ts", "12 hours"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").cast("string").alias("s"),
            F.col("session_window.end").cast("string").alias("e"),
            "n_events",
        )
        .collect()
    )
    got = {(r["user_id"], r["s"], r["e"]): r["n_events"] for r in out}
    assert got == {
        (1, "2024-01-01 00:00:00", "2024-01-01 12:10:00"): 2,
        (1, "2024-01-01 13:00:00", "2024-01-02 01:00:00"): 1,
        (2, "2024-01-01 01:00:00", "2024-01-01 13:00:00"): 1,
    }


def test_k_anonymity_no_small_cells(spark):
    """Every published cell must describe >= k people except the
    masked residual — and the residual must absorb exactly the
    suppressed population (nothing lost, nothing duplicated)."""
    reg = load_registry()
    out = reg["dq4_k_anonymity"].build(spark, "/root/testdata/sf0.01").collect()
    residual = [r for r in out if r["nation_qi"] == "*"]
    kept = [r for r in out if r["nation_qi"] != "*"]
    assert all(r["n_customers"] >= 10 for r in kept)
    assert len(residual) == 1 and residual[0]["segment_qi"] == "*"
    total = sum(r["n_customers"] for r in out)
    from oxi_diel_db_spark.tables import load

    assert total == load(spark, "customer", "/root/testdata/sf0.01").count()


def test_volume_anomaly_flags_staged_outage(spark):
    """The staged outage day (15th, filtered in-query) must surface on
    the date spine with n = 0 and be flagged; fully-present days with a
    trailing window must not be."""
    reg = load_registry()
    out = reg["dq5_volume_anomaly"].build(spark, "/root/testdata/sf0.01").collect()
    by_day = {r["day"].day: r for r in out}
    assert by_day[15]["n"] == 0 and by_day[15]["is_anomaly"] is True
    normal = [r for r in out if r["day"].day not in (15,) and r["trailing_avg"] > 0]
    # a normal day sits near its trailing average - none flagged
    assert all(r["is_anomaly"] is False for r in normal if r["day"].day > 8)


def test_leakage_safe_split_never_straddles(spark):
    """The defining property: no near-dup cluster spans two splits
    (per-doc p8 splitting CAN leak; cluster-keyed splitting cannot)."""
    from pyspark.sql import functions as F

    reg = load_registry()
    out = reg["p12_leakage_safe_split"].build(spark, "/root/testdata/sf0.01")
    spans = (
        out.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n_splits") > 1)
    )
    assert spans.count() == 0
    # and the corpus really has multi-doc clusters for this to bite on
    assert (
        out.groupBy("cluster_id").count().filter(F.col("count") > 1).count() > 0
    )


def test_reconciliation_counts_childless(spark):
    reg = load_registry()
    rows = {r["band"]: r["n_orders"] for r in reg["dq6_reconciliation"].build(spark, "/root/testdata/sf0.01").collect()}
    assert rows.get("no_lineitems", 0) == 257  # childless orders surface
    assert sum(rows.values()) == 15000  # every order lands in one band


def test_corpus_ledger_complete_and_sound(spark):
    """c2: every document appears EXACTLY once; every stage fires
    (nonvacuous pipeline); kept docs' clusters never straddle splits;
    benchmark docs never reach the corpus."""
    from pyspark.sql import functions as F

    from oxi_diel_db_spark.tables import load

    reg = load_registry()
    out = reg["c2_corpus_ledger"].build(spark, "/root/testdata/sf0.01")
    out.cache()
    n_docs = load(spark, "documents", "/root/testdata/sf0.01").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    stages = {r["stage"]: r["n"] for r in out.groupBy("stage").agg(F.count(F.lit(1)).alias("n")).collect()}
    for st in ["benchmark", "quality", "exact_dup", "near_dup",
               "contaminated", "sampled_out", "kept"]:
        assert stages.get(st, 0) > 0, f"stage {st} never fired"
    kept = out.filter(F.col("stage") == "kept")
    straddle = (
        kept.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
    )
    assert straddle.count() == 0
    assert kept.filter(F.col("doc_id") % 23 == 0).count() == 0
    out.unpersist()


def test_table_diff_kernel(spark):
    """added/removed/changed statuses, null-safe compare (NULL->NULL is
    NOT a change, NULL->value IS), unchanged rows absent."""
    from oxi_diel_db_spark.operators.scale import table_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, None), (3, 30.0, "c"), (4, None, "d")],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 25.0, None), (4, 40.0, "d"), (5, 50.0, "e")],
        "k long, v double, s string",
    )
    got = {r.k: (r.status, sorted(r.changed_cols)) for r in table_diff(old, new, ["k"]).collect()}
    assert got == {
        2: ("changed", ["v"]),          # s NULL->NULL not a change
        3: ("removed", []),
        4: ("changed", ["v"]),          # v NULL->40 is a change
        5: ("added", []),
    }
    assert 1 not in got


def test_table_diff_partition_property(spark):
    """Property (hypothesis): for random old/new frames, table_diff's
    statuses partition the key space exactly — added = new∖old,
    removed = old∖new, changed ⊆ old∩new, and changed ∪ (silent
    identical) = old∩new."""
    from hypothesis import given, settings, strategies as st

    from oxi_diel_db_spark.operators.scale import table_diff

    rows = st.lists(
        st.tuples(
            st.integers(0, 15),
            st.one_of(st.none(), st.integers(0, 3)),
        ),
        max_size=12,
        unique_by=lambda r: r[0],
    )

    @settings(max_examples=10, deadline=None)
    @given(old_rows=rows, new_rows=rows)
    def prop(old_rows, new_rows):
        old = spark.createDataFrame(old_rows or [(999, None)], "k long, v long")
        new = spark.createDataFrame(new_rows or [(998, None)], "k long, v long")
        out = table_diff(old, new, ["k"]).collect()
        ok, nk = {r[0] for r in (old_rows or [(999, None)])}, {
            r[0] for r in (new_rows or [(998, None)])
        }
        ov, nv = dict(old_rows or [(999, None)]), dict(new_rows or [(998, None)])
        got = {r.k: r.status for r in out}
        assert {k for k, s in got.items() if s == "added"} == nk - ok
        assert {k for k, s in got.items() if s == "removed"} == ok - nk
        changed = {k for k, s in got.items() if s == "changed"}
        assert changed == {k for k in ok & nk if ov[k] != nv[k]}

    prop()


def test_dq9_flags_violations_cross_engine(spark, tmp_path):
    """dq9 against a deliberately broken drop: doc_id duplicated and
    wrongly typed (int32), source column missing, one negative n_chars,
    one n_chars/length mismatch. Both engines must produce the same
    per-rule verdicts — and those verdicts must be the RIGHT fails."""
    import duckdb

    bad_dir = str(tmp_path / "bad_sf")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bad = (
        docs.limit(50)
        .drop("source")
        .withColumn("doc_id", (F.col("doc_id") % 10).cast("int"))
        .withColumn(
            "n_chars",
            F.when(F.col("doc_id") == 1, F.lit(-5)).otherwise(
                F.when(F.col("doc_id") == 2, F.col("n_chars") + 7).otherwise(
                    F.col("n_chars")
                )
            ),
        )
    )
    import os

    bad.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(bad_dir, "documents.parquet")
    )

    qdef = load_registry()["dq9_schema_contract"]
    got = {r["rule"]: (r["status"], r["n_violations"])
           for r in qdef.build(spark, bad_dir).collect()}

    assert got["present:source"] == ("fail", 1)
    assert got["type:source"] == ("fail", 1)
    assert got["type:doc_id"] == ("fail", 1)  # int32, contract says bigint
    assert got["present:doc_id"] == ("pass", 0)
    assert got["unique:doc_id"][0] == "fail"
    assert got["non_negative:n_chars"][0] == "fail"
    assert got["len_consistent:n_chars"][0] == "fail"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{bad_dir}/documents.parquet/*.parquet')"
    )
    duck = {r[0]: (r[1], r[2]) for r in con.execute(qdef.oracle).fetchall()}
    assert duck == got


def test_dq10_ks_matches_numpy(spark):
    """The bucketed two-pass CDF must reproduce the textbook two-sample
    KS statistic: numpy computes D = max |F_ref - F_cur| naively over
    the same even/odd split of sf0.001 events.value."""
    import numpy as np

    from oxi_diel_db_spark.queries import load_registry
    from oxi_diel_db_spark.queries._util import t

    row = (
        load_registry()["dq10_ks_drift"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()[0]
    )
    pdf = (
        t(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "value")
        .toPandas()
    )
    ref = np.sort(pdf.loc[pdf.event_id % 2 == 0, "value"].to_numpy())
    cur = np.sort(pdf.loc[pdf.event_id % 2 == 1, "value"].to_numpy())
    pooled = np.unique(np.concatenate([ref, cur]))
    f_ref = np.searchsorted(ref, pooled, side="right") / len(ref)
    f_cur = np.searchsorted(cur, pooled, side="right") / len(cur)
    d = np.abs(f_ref - f_cur)
    assert row["n_ref"] == len(ref) and row["n_cur"] == len(cur)
    assert abs(row["ks_d"] - d.max()) < 1e-6
    # argmax with smallest-value tie-break
    assert row["ks_at"] == pooled[np.argmax(d)]
    crit = 1.358 * np.sqrt((len(ref) + len(cur)) / (len(ref) * len(cur)))
    assert abs(row["crit_05"] - crit) < 1e-6
    assert row["drifted"] == int(round(d.max(), 6) > round(crit, 6))


def test_dq17_flags_planted_dimension_shift(spark):
    """Planted drift: dim 3 of the 'current' half shifts by +5σ, every
    other dim is identically distributed — dq17 must flag exactly that
    dimension (|z| > 3 is a ~1-in-370 false-positive per clean dim at
    these n, and the planted shift's z is enormous)."""
    import math

    from oxi_diel_db_spark.queries.quality import dq17_embedding_drift  # noqa: F401
    from oxi_diel_db_spark.queries import load_registry
    import pyspark.sql.functions as F
    import tempfile

    rows = []
    for i in range(2000):
        # deterministic pseudo-noise, mean 0
        v = [math.sin(i * 7.31 + j * 1.77) * 0.5 for j in range(8)]
        if i >= 1000:
            v[2] += 2.0  # dim 3 (1-based) shifts in the current half
        rows.append((i, v, 0))
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    work = tempfile.mkdtemp(prefix="dq17_fixture_")
    df.write.parquet(f"{work}/embeddings.parquet")
    # reuse the real tables for everything else the loader may touch
    out = {
        r["dim"]: r
        for r in load_registry()["dq17_embedding_drift"].build(spark, work).collect()
    }
    assert len(out) == 8
    assert out[3]["drifted"] == 1 and abs(out[3]["z"]) > 10
    assert sum(r["drifted"] for r in out.values()) == 1
    assert abs(out[3]["delta"] - 2.0) < 0.1


def test_dq17_no_drift_between_identical_populations(spark):
    """Identical ref/current distributions → no dim flags."""
    import math
    import tempfile

    from oxi_diel_db_spark.queries import load_registry

    rows = [
        (i, [math.sin((i % 1000) * 3.17 + j) for j in range(4)], 0)
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    work = tempfile.mkdtemp(prefix="dq17_null_")
    df.write.parquet(f"{work}/embeddings.parquet")
    out = load_registry()["dq17_embedding_drift"].build(spark, work).collect()
    assert len(out) == 4
    assert all(r["drifted"] == 0 for r in out)


def test_dq19_leak_flags_and_composition(spark):
    """dq19's verdicts must re-derive from its own inputs: the pair set
    IS d3's output (no pair invented or dropped), each pair's splits
    match p20's assignment, leaked ≡ split mismatch — and at gate
    scale BOTH leak classes must be populated (the split threshold was
    chosen so the audit is non-vacuous; a constant column would pin
    nothing)."""
    from oxi_diel_db_spark.queries import load_registry

    sf = "/root/testdata/sf0.01"
    reg = load_registry()
    rows = reg["dq19_split_leakage_audit"].build(spark, sf).collect()
    d3 = {
        (r["doc_a"], r["doc_b"])
        for r in reg["d3_minhash_lsh"].build(spark, sf).collect()
    }
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == d3
    split = {
        r["doc_id"]: r["split"]
        for r in reg["p20_shard_export"].build(spark, sf).collect()
    }
    for r in rows:
        assert r["split_a"] == split[r["doc_a"]]
        assert r["split_b"] == split[r["doc_b"]]
        assert r["leaked"] == int(r["split_a"] != r["split_b"])
    leaked = sum(r["leaked"] for r in rows)
    assert 0 < leaked < len(rows)  # both classes populated


def test_c7_release_gate_detects_planted_leak(spark, tmp_path):
    """c7's leak columns are legitimately ZERO on the gate corpus
    (c2's cluster-aware split + keep-best dedup resolves every d3 pair
    before export — that zero is the audit passing). This test proves
    the detection path is LIVE, the dq19 non-vacuity pattern: plant a
    corpus holding a pair that d3's banded MinHash flags (a shared
    2-slot band → est_jaccard = 0.25) but whose exact 3-shingle
    Jaccard sits under c2's 0.2 clustering threshold, so BOTH members
    survive curation in separate clusters whose csplit hashes land in
    different splits — a genuine leak. c7 must report the pair as
    'leaked' and flag both members' shards in both splits."""
    import hashlib

    import pyspark.sql.functions as F

    from oxi_diel_db_spark.functions import text as TX
    from oxi_diel_db_spark.queries import load_registry

    def sh3(words):
        return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}

    def sig8(shingle_set):
        return [
            min(
                hashlib.md5(f"{s}:{x}".encode()).hexdigest()
                for x in shingle_set
            )
            for s in range(8)
        ]

    def bandkeys(sig):
        return [
            hashlib.md5((sig[2 * b] + sig[2 * b + 1]).encode()).hexdigest()
            for b in range(4)
        ]

    def split_of(doc_id):
        h = hashlib.md5(f"csplit:{doc_id}".encode()).hexdigest()[:8]
        return "train" if h < "cccccccc" else ("val" if h < "e6666666" else "test")

    # doc ids in different splits, outside the benchmark residue class
    ids = [i for i in range(1, 60) if i % 23 != 0]
    id_a = next(i for i in ids if split_of(i) == "train")
    id_b = next(i for i in ids if split_of(i) == "val")

    shared = "the fast data engine and the sort".split()  # 5 shared shingles
    stops = ["the", "and", "of", "in", "a", "is", "the", "and", "now"]
    planted = None
    for i in range(5000):
        # regenerate BOTH fillers per salt: a fixed doc A pins its
        # 8 slot argmins, and if none falls in the shared run NO B can
        # ever match a slot (measured: exactly that happened) — fresh
        # fillers on both sides make each trial an independent
        # ~4*j^2 band-collision draw
        ua = [f"f{i}a{k}" for k in range(9)]
        ub = [f"f{i}b{k}" for k in range(9)]
        words_a = shared + [w for p in zip(stops, ua) for w in p]
        words_b = shared + [w for p in zip(stops, ub) for w in p]
        s_a, s_b = sh3(words_a), sh3(words_b)
        if len(s_a & s_b) / len(s_a | s_b) >= 0.2:  # c2's cluster gate
            continue
        if set(bandkeys(sig8(s_a))) & set(bandkeys(sig8(s_b))):
            planted = (words_a, words_b)
            break
    assert planted is not None, "no band collision found in 5000 salts"

    text_a, text_b = " ".join(planted[0]), " ".join(planted[1])
    # distinct vocabularies for the rest of the corpus: no accidental
    # d3 pairs, zero 3-gram contamination overlap with the benchmark
    others = [
        (23, "zebra yak xylem wombat vulture umbra toucan swan raven "
             "quail puffin osprey newt moth lark koala ibis heron"),
        (24, "anchor bronze copper driftwood ember flint granite "
             "harbor ingot jasper kelp lumen marble nickel onyx"),
        (25, "apple berry cedar daisy elm fern grove hazel iris "
             "juniper kale lotus maple nettle oak poppy"),
    ]
    rows = [(id_a, text_a), (id_b, text_b)] + others
    df = spark.createDataFrame(
        [(i, tx, "en", "src0", len(tx)) for i, tx in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    # fixture sanity: both planted docs clear the c2 quality gate
    q = {
        r["doc_id"]: r["q"]
        for r in df.select(
            "doc_id", TX.quality_score("text").alias("q")
        ).collect()
    }
    assert q[id_a] >= 0.45 and q[id_b] >= 0.45, q
    df.write.parquet(str(tmp_path / "documents.parquet"))

    out = (
        load_registry()["c7_release_gate"].build(spark, str(tmp_path)).collect()
    )
    pair_rows = {r["k1"]: r["docs"] for r in out if r["kind"] == "pairs"}
    assert pair_rows.get("leaked", 0) >= 1, pair_rows
    shard_rows = [(r["k1"], r["leak_docs"]) for r in out if r["kind"] == "shard"]
    assert sum(n for _, n in shard_rows) >= 2, shard_rows
    assert len({sp for sp, n in shard_rows if n >= 1}) == 2, shard_rows
