"""Distributed global ranking (operators/ranking.py): row-identical to the
single-partition `row_number()/ntile() OVER (ORDER BY ...)` builtins, with
no single-partition window stage in the plan."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators.ranking import (
    global_ntile,
    global_row_number,
    ntile_from_rank,
)


def _df(spark, n=237, parts=7):
    # Non-monotonic values + unique id tie-break; deliberately unsorted
    # layout across several input partitions.
    return spark.range(n, numPartitions=parts).select(
        F.col("id"),
        ((F.col("id") * 37) % 11).alias("v"),
    )


class TestGlobalRowNumber:
    def test_matches_single_partition_window(self, spark):
        df = _df(spark)
        got = {
            (r.id, r.rank)
            for r in global_row_number(df, ["v", "id"], "rank").collect()
        }
        want = {
            (r.id, r.rank)
            for r in df.withColumn(
                "rank", F.row_number().over(Window.orderBy("v", "id"))
            ).collect()
        }
        assert got == want

    def test_rank_is_dense_permutation(self, spark):
        ranks = [
            r.rank
            for r in global_row_number(_df(spark, 50), ["v", "id"]).collect()
        ]
        assert sorted(ranks) == list(range(1, 51))

    def test_rank_exact_and_stable_across_actions(self, spark):
        """Round-4 regression: the kernel schedules two actions (offsets
        collect + final plan) that MUST see the same bucket layout.
        repartitionByRange reseeds its boundary sampler per action
        (byteswap32(-rdd.id-1)), which scrambled ~2% of ranks at sf0.1
        under a default session; the deterministic-boundary kernel must
        match the exact sort position on every run."""
        df = spark.range(20000, numPartitions=16).select(
            F.col("id"), ((F.col("id") * 2654435761) % 97777).alias("v")
        )
        want = {
            id_: i + 1
            for i, (_, id_) in enumerate(
                sorted((r.v, r.id) for r in df.collect())
            )
        }
        for _ in range(3):
            got = {
                r.id: r.rank
                for r in global_row_number(df, ["v", "id"], "rank").collect()
            }
            assert got == want

    def test_no_single_partition_window(self, spark):
        plan = global_row_number(_df(spark), ["v", "id"])._jdf.queryExecution().executedPlan().toString()
        # The window must be keyed by the deterministic bucket id, never empty.
        assert "windowspecdefinition(__b" in plan.replace(" ", "").lower() or "__b" in plan
        assert "SinglePartition" not in plan


class TestGlobalNtile:
    @pytest.mark.parametrize("n,k", [(237, 10), (40, 7), (10, 10), (3, 10), (1, 4)])
    def test_matches_builtin_ntile(self, spark, n, k):
        df = _df(spark, n)
        got = {
            (r.id, r.bucket)
            for r in global_ntile(df, ["v", "id"], k).collect()
        }
        want = {
            (r.id, r.b)
            for r in df.withColumn(
                "b", F.ntile(k).over(Window.orderBy("v", "id"))
            ).collect()
        }
        assert got == want

    def test_ntile_from_rank_formula(self, spark):
        # 10 rows, k=4 -> bucket sizes 3,3,2,2 exactly like SQL NTILE.
        df = spark.range(1, 11).select(F.col("id").alias("rank"))
        out = df.select(
            "rank", ntile_from_rank(F.col("rank"), 10, 4).alias("b")
        ).collect()
        sizes = {}
        for r in out:
            sizes[r.b] = sizes.get(r.b, 0) + 1
        assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}


class TestGlobalPrefixSum:
    def test_matches_single_partition_window(self, spark):
        from eurostat_energy_etl_pipeline_spark.operators.ranking import (
            global_prefix_sum,
        )

        df = _df(spark, 300).withColumn("m", (F.col("id") % 13) + 1)
        got = {
            r.id: r.cumsum
            for r in global_prefix_sum(df, ["v", "id"], "m").collect()
        }
        w = Window.orderBy("v", "id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = {
            r.id: r.cumsum
            for r in df.withColumn("cumsum", F.sum("m").over(w)).collect()
        }
        assert got == want

    def test_stable_across_actions(self, spark):
        from eurostat_energy_etl_pipeline_spark.operators.ranking import (
            global_prefix_sum,
        )

        df = spark.range(5000, numPartitions=11).select(
            F.col("id"),
            ((F.col("id") * 2654435761) % 7777).alias("v"),
            ((F.col("id") % 7) + 1).alias("m"),
        )
        runs = [
            sorted((r.id, r.cumsum) for r in
                   global_prefix_sum(df, ["v", "id"], "m").collect())
            for _ in range(2)
        ]
        assert runs[0] == runs[1]


class TestContractGuards:
    def test_nan_order_key_raises(self, spark):
        """NaN order keys would mis-sort the driver-computed boundaries
        (Python NaN comparisons are incoherent, Spark orders NaN last):
        the kernel must refuse them instead of silently scrambling ranks."""
        df = spark.range(100).select(
            F.col("id"),
            F.when(F.col("id") == 37, F.lit(float("nan")))
            .otherwise(F.col("id").cast("double"))
            .alias("v"),
        )
        with pytest.raises(ValueError, match="NaN"):
            global_row_number(df, ["v", "id"]).collect()

    def test_prefix_sum_rejects_fractional_values(self, spark):
        """A fractional value column would be truncated per-row by the
        64-bit integer sum — the kernel raises instead of quietly
        returning a wrong running total."""
        from eurostat_energy_etl_pipeline_spark.operators.ranking import (
            global_prefix_sum,
        )

        df = _df(spark, 50).withColumn("m", F.col("id") / 2.0)
        with pytest.raises(TypeError, match="integral"):
            global_prefix_sum(df, ["v", "id"], "m")

    def test_bucket_count_capped(self, spark):
        """num_partitions far above _MAX_BUCKETS must not generate an
        O(P) when-chain: the kernel caps the bucket count (ranks stay
        exact — only the layout changes)."""
        from eurostat_energy_etl_pipeline_spark.operators.ranking import (
            _MAX_BUCKETS,
        )

        df = _df(spark, 400)
        out = global_row_number(df, ["v", "id"], "rank", num_partitions=100000)
        assert out.rdd.getNumPartitions() <= _MAX_BUCKETS
        ranks = sorted(r.rank for r in out.collect())
        assert ranks == list(range(1, 401))
