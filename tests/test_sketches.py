"""Sketch rollup store lifecycle pins (sk01-sk05).

The oracle-parity sweep grades the registered queries' VALUES; these
tests pin the store-lifecycle invariants the oracle is deliberately
blind to: append mergeability/idempotence, compaction answer
preservation + deferred GC, writer mutual exclusion, and count-min's
one-sided error guarantee.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.functions import sketches as sk


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _mk(spark, lo, hi, seg):
    """(grp, val, seg) synthetic slice: values lo..hi-1, two groups."""
    return spark.range(lo, hi).select(
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("grp"),
        F.col("id").alias("val"),
        F.lit(seg).alias("seg"),
    )


class TestHllStore:
    def test_append_union_and_idempotence(self, spark, tmp_path):
        root = str(tmp_path / "hll")
        sk.write_hll_store(spark, root, _mk(spark, 0, 400, 1), "grp", "val", "seg")
        sk.append_hll_segments(
            spark, root, _mk(spark, 400, 900, 2), "grp", "val", "seg"
        )
        # merged registers == registers of a one-shot build over the union
        direct = str(tmp_path / "hll_direct")
        sk.write_hll_store(
            spark, direct, _mk(spark, 0, 900, 1), "grp", "val", "seg"
        )
        merged = (
            sk.read_hll_registers(spark, root)
            .groupBy("grp", "j")
            .agg(F.max("mrho").alias("m"))
        )
        want = (
            sk.read_hll_registers(spark, direct)
            .groupBy("grp", "j")
            .agg(F.max("mrho").alias("m"))
        )
        assert _rows(merged, ("grp", "j", "m")) == _rows(want, ("grp", "j", "m"))
        # re-appending the SAME slice is idempotent under max-merge
        # (at-least-once ingest needs no dedup ledger)
        before = _rows(sk.hll_estimates(sk.read_hll_registers(spark, root)),
                       ("grp", "est", "s_scaled", "zero_regs"))
        sk.append_hll_segments(
            spark, root, _mk(spark, 400, 900, 2), "grp", "val", "seg"
        )
        after = _rows(sk.hll_estimates(sk.read_hll_registers(spark, root)),
                      ("grp", "est", "s_scaled", "zero_regs"))
        assert after == before

    def test_compact_preserves_answers_with_deferred_gc(self, spark, tmp_path):
        root = str(tmp_path / "hll")
        sk.write_hll_store(spark, root, _mk(spark, 0, 300, 1), "grp", "val", "seg")
        sk.append_hll_segments(
            spark, root, _mk(spark, 300, 700, 2), "grp", "val", "seg"
        )
        before = _rows(sk.hll_estimates(sk.read_hll_registers(spark, root)),
                       ("grp", "est", "s_scaled", "zero_regs"))
        old = sk._read_layout(root)
        st = sk.compact_hll_store(spark, root)
        assert st["gen"] == old["gen"] + 1
        after = _rows(sk.hll_estimates(sk.read_hll_registers(spark, root)),
                      ("grp", "est", "s_scaled", "zero_regs"))
        assert after == before
        # superseded dir survives one cycle for in-flight readers…
        assert os.path.isdir(os.path.join(root, old["data"]))
        # …and the NEXT compaction sweeps it (deferred GC)
        sk.compact_hll_store(spark, root)
        assert not os.path.isdir(os.path.join(root, old["data"]))

    def test_estimates_land_within_tolerance(self, spark, tmp_path):
        root = str(tmp_path / "hll")
        sk.write_hll_store(spark, root, _mk(spark, 0, 3000, 1), "grp", "val", "seg")
        exact = {"even": 1500, "odd": 1500}
        for r in sk.hll_estimates(sk.read_hll_registers(spark, root)).collect():
            assert abs(r["est"] - exact[r["grp"]]) <= 0.2 * exact[r["grp"]]

    def test_writer_mutual_exclusion(self, spark, tmp_path):
        from kt_sql_hbase_ex_spark.functions.text_index import (
            IndexWriterConflict,
        )

        root = str(tmp_path / "hll")
        sk.write_hll_store(spark, root, _mk(spark, 0, 50, 1), "grp", "val", "seg")
        with open(os.path.join(root, "writer.lock"), "w"):
            pass
        with pytest.raises(IndexWriterConflict):
            sk.append_hll_segments(
                spark, root, _mk(spark, 50, 60, 2), "grp", "val", "seg"
            )
        os.unlink(os.path.join(root, "writer.lock"))


class TestCmStore:
    def _toks(self, spark, vals):
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "doc_id long, tok string"
        )

    def test_counters_are_additive(self, spark, tmp_path):
        a = self._toks(spark, ["x", "y", "x", "z"])
        b = self._toks(spark, ["x", "z", "z", "w"])
        both = a.unionByName(b)
        root = str(tmp_path / "cm")
        sk.write_cm_store(spark, root, sk.cm_counters(a))
        sk.append_cm_counters(spark, root, sk.cm_counters(b))
        got = _rows(sk.read_cm_counters(spark, root), ("i", "b", "cnt"))
        want = _rows(sk.cm_counters(both), ("i", "b", "cnt"))
        assert got == want
        # compaction collapses the append rows without changing answers
        sk.compact_cm_store(spark, root)
        assert _rows(sk.read_cm_counters(spark, root), ("i", "b", "cnt")) == want

    def test_estimate_never_underestimates(self, spark, tmp_path):
        vals = ["a"] * 7 + ["b"] * 3 + ["c"] * 5 + ["d"]
        root = str(tmp_path / "cm")
        sk.write_cm_store(spark, root, sk.cm_counters(self._toks(spark, vals)))
        counters = {(r["i"], r["b"]): r["cnt"]
                    for r in sk.read_cm_counters(spark, root).collect()}
        import hashlib as _h

        for tok, exact in (("a", 7), ("b", 3), ("c", 5), ("d", 1)):
            est = min(
                counters.get(
                    (i, int(_h.md5(f"{i}:{tok}".encode()).hexdigest()[:8], 16)
                     % sk._CM_W), 0)
                for i in range(sk._CM_D)
            )
            assert est >= exact  # the count-min one-sided guarantee


class TestQuantileStore:
    def test_histogram_additivity_and_error_bound(self, spark, tmp_path):
        df = spark.range(1, 2001).select(
            F.lit("g").alias("grp"),
            (F.col("id").cast("double") * 1.37 + 3.0).alias("v"),
        )
        a = df.filter(F.col("id") % 2 == 0)
        b = df.filter(F.col("id") % 2 == 1)
        root = str(tmp_path / "qs")
        sk._counter_write(
            spark, root, sk.price_histogram(a, "grp", "v"), ("grp", "b"),
            "qhist",
        )
        sk._counter_append(spark, root, sk.price_histogram(b, "grp", "v"))
        got = _rows(sk._counter_read(spark, root), ("grp", "b", "cnt"))
        want = _rows(sk.price_histogram(df, "grp", "v"), ("grp", "b", "cnt"))
        assert got == want  # segment addition == whole-corpus histogram
        # compaction preserves the histogram
        sk._counter_compact(spark, root)
        assert _rows(sk._counter_read(spark, root), ("grp", "b", "cnt")) == want
        # the 16-sub-bucket midpoint estimate lands within the ~3.2%
        # resolution bound of the true percentile (uniform values)
        est = sk.histogram_quantiles(sk._counter_read(spark, root)).first()
        vals = sorted(r["v"] for r in df.collect())
        for q, e in ((0.5, est["p50_est"]), (0.9, est["p90_est"])):
            true = vals[int(q * (len(vals) - 1))]
            assert abs(e - true) <= 0.05 * true, (q, e, true)


class TestKmvStore:
    def _df(self, spark, lo, hi):
        return spark.range(lo, hi).select(
            F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("g"),
            F.col("id").alias("v"),
        )

    def test_merge_identity_and_idempotence(self, spark, tmp_path):
        root = str(tmp_path / "kmv")
        a, b = self._df(spark, 0, 700), self._df(spark, 500, 1400)
        sk.write_kmv_store(spark, root, a, "g", "v")
        sk.append_kmv_batch(spark, root, b, "g", "v")
        # minK(minK(A) ∪ minK(B)) == minK(A ∪ B) — the merge identity
        want = _rows(
            sk.kmv_minks(self._df(spark, 0, 1400), "g", "v"), ("grp", "h")
        )
        assert _rows(sk.read_kmv_minks(spark, root), ("grp", "h")) == want
        # distinct-based: re-appending the same slice changes nothing
        sk.append_kmv_batch(spark, root, b, "g", "v")
        assert _rows(sk.read_kmv_minks(spark, root), ("grp", "h")) == want
        # compaction drops beyond-K candidates, answers unchanged
        sk.compact_kmv_store(spark, root)
        assert _rows(sk.read_kmv_minks(spark, root), ("grp", "h")) == want

    def test_overlap_estimate_tracks_truth(self, spark, tmp_path):
        # two groups sharing exactly half their members
        df = spark.range(0, 1200).select(
            F.when(F.col("id") < 800, "A").otherwise("B").alias("g"),
            (F.col("id") % 800).alias("v"),  # B's 400 values ⊂ A's 800
        )
        root = str(tmp_path / "kmv2")
        sk.write_kmv_store(spark, root, df, "g", "v")
        minks = {(r["grp"], r["h"]) for r in
                 sk.read_kmv_minks(spark, root).collect()}
        a = sorted(h for g, h in minks if g == "A")
        b = sorted(h for g, h in minks if g == "B")
        union = sorted(set(a) | set(b))[: sk._KMV_K]
        ku, thu = len(union), union[-1]
        est_u = (sk._KMV_K - 1) * sk._KMV_POW / thu if ku == sk._KMV_K else ku
        c = sum(1 for h in union if h in set(a) and h in set(b))
        est_i = c * est_u / ku
        assert abs(est_u - 800) <= 0.2 * 800   # |A ∪ B| = 800
        assert abs(est_i - 400) <= 0.3 * 400   # |A ∩ B| = 400


class TestCaggStore:
    def test_cascade_levels_match_direct_aggregation(self, spark, tmp_path):
        from kt_sql_hbase_ex_spark.functions.money import _micros
        from kt_sql_hbase_ex_spark.operators.timeseries import (
            append_cagg_batch,
            rollup_cagg_store,
        )
        from kt_sql_hbase_ex_spark.functions.sketches import _read_layout

        ev = spark.range(0, 500).select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias(
                "event_type"
            ),
            (
                F.to_timestamp(F.lit("2024-03-01 00:00:00"))
                + F.make_interval(mins=(F.col("id") * 17) % (3 * 1440))
            ).alias("ts"),
            (F.col("id").cast("double") * 0.25 + 1.0).alias("value"),
        )
        root = str(tmp_path / "cagg")
        for b in range(2):
            append_cagg_batch(spark, root, ev.filter(F.col("event_id") % 2 == b))
        st = rollup_cagg_store(spark, root)
        assert st["gen"] == 1

        import os

        layout = _read_layout(root)
        days = {
            (r["event_type"], r["db"]): (r["pn"], r["psum"])
            for r in spark.read.parquet(
                os.path.join(root, layout["day"])
            ).collect()
        }
        want = {
            (r["event_type"], r["db"]): (r["pn"], r["psum"])
            for r in ev.groupBy(
                "event_type", F.date_trunc("day", "ts").alias("db")
            )
            .agg(
                F.count("*").alias("pn"),
                F.sum(_micros(F.col("value"))).alias("psum"),
            )
            .collect()
        }
        assert days == want  # day level (derived from HOURS) == direct
        # a second rollup over the folded store is idempotent
        rollup_cagg_store(spark, root)
        layout = _read_layout(root)
        days2 = {
            (r["event_type"], r["db"]): (r["pn"], r["psum"])
            for r in spark.read.parquet(
                os.path.join(root, layout["day"])
            ).collect()
        }
        assert days2 == want
