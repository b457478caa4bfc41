"""M5 — custom stateful streaming operator via applyInPandasWithState.

A per-user running event counter: state (the count so far) persists
across micro-batches; the staged source is split into multiple files
with maxFilesPerTrigger=1 so the stream REALLY processes several
micro-batches and the state handoff is exercised (not a single-batch
degenerate run). The final per-user count must equal the batch
groupBy count — which is the DuckDB oracle. Counts are monotone, so
"final" = max over the update-mode sink rows.

At scale this is the template for incremental rule-statistic
maintenance: state keyed by user/antecedent, partition-parallel,
evicted by timeout.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from chi_frbcs_bigdatacs_spark.plans.registry import register

N_SOURCE_FILES = 4


def _staged_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage events as N parquet files -> N micro-batches."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = tempfile.mkdtemp(prefix="chi_stateful_src_")
    batch.repartition(N_SOURCE_FILES).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    return stream


def q_stream_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _staged_stream(spark, sf_dir).select("user_id", "event_id")

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [user_id], "n": [total]})

    counted = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"chi_state_sink_{uuid.uuid4().hex[:12]}"
    q = (
        counted.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode sink holds one row per (user, batch); counts are
    # monotone so the final state is the max
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n").alias("n_events"))
    )


STREAM_STATEFUL_SQL = """
SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
"""


def register_all() -> None:
    register("stream_stateful_count", q_stream_stateful_count, STREAM_STATEFUL_SQL)
