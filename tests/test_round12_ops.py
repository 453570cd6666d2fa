"""Round-12 regression tests: ADVICE r11 closures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import DataFrame


class TestScratchRegistry:
    """ADVICE r11 #1: the scratch registry must not strongly reference
    the SparkSession (a bucket of DataFrame wrappers reaches the
    session via .sparkSession, so the weakref.finalize cleanup could
    never fire)."""

    def test_bucket_holds_no_dataframe_wrappers(self, spark):
        from cs422pp_mapreduce_spark.session import (
            _SCRATCH,
            evict_scratch,
            scratch_persist,
        )

        evict_scratch(spark)  # clean slate
        df = scratch_persist(spark.range(10))
        try:
            bucket = _SCRATCH[id(spark)]
            assert bucket, "scratch_persist must register"
            for obj in bucket:
                # py4j Dataset handles only — never the Python wrapper
                # (which transitively pins the session via .sparkSession;
                # a JavaObject holds only the gateway client)
                assert not isinstance(obj, DataFrame)
            assert df.storageLevel.useMemory or df.storageLevel.useDisk
        finally:
            evict_scratch(spark)
        assert id(spark) not in _SCRATCH
        # the jdf handle unpersisted the frame JVM-side (df.is_cached is
        # a stale Python-side flag; storageLevel queries the JVM)
        lvl = df.storageLevel
        assert not (lvl.useMemory or lvl.useDisk)

    def test_evict_is_idempotent(self, spark):
        from cs422pp_mapreduce_spark.session import evict_scratch

        evict_scratch(spark)
        evict_scratch(spark)  # second call on an empty registry: no-op


class TestLateAuditWatermarkConstant:
    """ADVICE r11 #2: the 2h delay derives from ONE constant on all
    three sites (stream watermark string, report cutoff, oracle SQL)."""

    def test_wm_string_derives_from_hours(self):
        from cs422pp_mapreduce_spark.streaming.events import (
            LATE_AUDIT_WM,
            LATE_AUDIT_WM_HOURS,
        )

        assert LATE_AUDIT_WM == f"{LATE_AUDIT_WM_HOURS} hours"

    def test_oracle_interval_derives_from_hours(self):
        from cs422pp_mapreduce_spark.oracles import _stream_late_audit_sql
        from cs422pp_mapreduce_spark.streaming.events import (
            LATE_AUDIT_WM_HOURS,
        )

        sql = _stream_late_audit_sql()
        assert f"INTERVAL {LATE_AUDIT_WM_HOURS} HOUR" in sql
        # no other hardcoded watermark interval survives
        assert "INTERVAL 2 HOUR\n" not in sql.replace(
            f"INTERVAL {LATE_AUDIT_WM_HOURS} HOUR", "X"
        )


class TestSuffixOracleCmpFloor:
    """ADVICE r11 #3: the oracle's cmp-cap arithmetic literally mirrors
    the Spark side's levels = max(1, ceil(log2(min(maxlen, cap))))."""

    def test_oracle_has_greatest_floor(self):
        from cs422pp_mapreduce_spark.oracles import _dedup_suffix_sql

        sql = _dedup_suffix_sql()
        assert "GREATEST(1, CEIL(LOG2(" in sql

    @pytest.mark.parametrize("maxlen", [1, 2, 3, 7, 8, 1000])
    def test_same_arithmetic_all_inputs(self, maxlen):
        """cmp = 2^max(1, ceil(log2(min(maxlen, cap)))) on both sides,
        including the maxlen=1 corner the old oracle got wrong (cmp=1
        vs Spark's 2)."""
        import duckdb

        from cs422pp_mapreduce_spark.operators.suffix import SUFFIX_CAP

        levels = max(1, math.ceil(math.log2(min(maxlen, SUFFIX_CAP))))
        spark_cmp = 1 << levels
        oracle_cmp = duckdb.sql(
            f"SELECT CAST(POWER(2, GREATEST(1, CEIL(LOG2(LEAST({maxlen},"
            f" {SUFFIX_CAP}))))) AS BIGINT)"
        ).fetchone()[0]
        assert oracle_cmp == spark_cmp
