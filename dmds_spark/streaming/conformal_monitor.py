"""Online conformal-coverage monitoring via ``applyInPandasWithState``
— the streaming twin of the batch ``eval_conformal_coverage`` query
(queries/round14b.py): the point model (per-type calibration means)
and the conformal radius q_hat are FROZEN offline; arriving
predictions fold their absolute residuals into per-type coverage
counters, and every micro-batch emits each touched type's CURRENT
achieved coverage — the live dashboard that tells you the moment the
world drifts past the calibration slice's guarantee (coverage falling
below 1-alpha is the retrain/recalibrate trigger).

Per type the state is TWO counters (n_test, n_covered) plus the
emission counter — O(|types|) state forever, nothing retains events.
Exact integers end to end: cents grid, |residual| vs the frozen
integer q_hat. Slicing- and order-independent (counts commute), so
the final emissions equal the batch query on the same slice in ANY
micro-batch arrangement — pinned in
tests/test_streaming_conformal.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CONFORMAL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("emit_seq", T.LongType()),
        T.StructField("n_test", T.LongType()),
        T.StructField("n_covered", T.LongType()),
        T.StructField("coverage_ppm", T.LongType()),
        T.StructField("q_hat_cents", T.LongType()),
    ]
)

CONFORMAL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_test", T.LongType()),
        T.StructField("n_covered", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _make_update(q_hat: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        n, cov, seq = state.get if state.exists else (0, 0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        for s in rows["s"]:
            n += 1
            if int(s) <= q_hat:
                cov += 1
        seq += 1
        state.update((int(n), int(cov), int(seq)))
        yield pd.DataFrame(
            [{
                "event_type": event_type,
                "emit_seq": seq,
                "n_test": n,
                "n_covered": cov,
                "coverage_ppm": cov * 1_000_000 // n,
                "q_hat_cents": q_hat,
            }]
        )

    return _update


def streaming_conformal_coverage(
    events: DataFrame, pred: DataFrame, q_hat: int
) -> DataFrame:
    """Per-micro-batch achieved conformal coverage over a stream of
    (event_type, value) predictions against the FROZEN per-type point
    model ``pred`` (event_type, pred_c — the batch query's calibration
    means) and frozen integer radius ``q_hat`` (cents). The residual
    computes JVM-side before the stateful fold (stream-static inner
    join + pure projection); a type absent from the calibration slice
    is dropped, matching the batch query's inner join."""
    joined = events.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    ).join(
        pred.select("event_type", F.col("pred_c").cast("bigint")
                    .alias("pred_c")),
        "event_type",
    ).select(
        "event_type",
        F.abs(F.col("cents") - F.col("pred_c")).alias("s"),
    )
    return joined.groupBy("event_type").applyInPandasWithState(
        _make_update(int(q_hat)),
        outputStructType=CONFORMAL_OUTPUT_SCHEMA,
        stateStructType=CONFORMAL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
