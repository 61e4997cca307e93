"""Custom stateful streaming operators (T3/T7 family; SURVEY §2.9).

The reference keeps its live state in an in-memory ``current_prices``
frame updated per tick (update_live_price.py:69, :164) — state that
dies with the process. ``applyInPandasWithState`` gives the same
per-symbol running state as a first-class streaming operator with
fault-tolerant state in the checkpoint: per key, an Arrow-batched
update function folds each micro-batch into the persisted state and
emits the refreshed snapshot.

State is kept in primitive columns (micros, not timestamps) so the
state encoder stays trivially stable across Spark versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: snapshot row emitted per symbol per micro-batch
RUNNING_OUTPUT_SCHEMA = (
    "symbol string, last_price double, last_ts_us long, n_ticks long, "
    "min_price double, max_price double"
)
#: persisted per-symbol state
RUNNING_STATE_SCHEMA = (
    "last_price double, last_ts_us long, n_ticks long, "
    "min_price double, max_price double"
)


def _update_running_state(key, pdf_iter, state: GroupState):
    import pandas as pd

    (symbol,) = key
    if state.exists:
        last_price, last_ts_us, n_ticks, min_price, max_price = state.get
    else:
        last_price, last_ts_us, n_ticks, min_price, max_price = (
            None,
            None,
            0,
            None,
            None,
        )
    for pdf in pdf_iter:
        pdf = pdf.dropna(subset=["price", "ts"])
        if not len(pdf):
            continue
        ts_us = (pdf["ts"].astype("int64") // 1000).astype("int64")  # ns → µs
        n_ticks += len(pdf)
        batch_min = float(pdf["price"].min())
        batch_max = float(pdf["price"].max())
        min_price = batch_min if min_price is None else min(min_price, batch_min)
        max_price = batch_max if max_price is None else max(max_price, batch_max)
        # Deterministic last-tick selection under ts ties: (ts, price)
        # max — idxmax picks whichever tied row Arrow happened to order
        # first, so a task retry / epoch replay could checkpoint a
        # DIFFERENT last_price than the original attempt (merge.py's
        # latest_ticks_per_day tie-breaks (ts desc, price desc) for the
        # same replay-determinism reason).
        batch_last_ts = int(ts_us.max())
        batch_last_price = float(pdf["price"][ts_us == batch_last_ts].max())
        if (
            last_ts_us is None
            or batch_last_ts > last_ts_us
            or (batch_last_ts == last_ts_us and batch_last_price > last_price)
        ):
            last_ts_us = batch_last_ts
            last_price = batch_last_price
    if n_ticks == 0:
        # nothing valid ever seen for this key — no state, no snapshot
        # (the reference's P7 filter drops such trades before they can
        # touch current_prices, update_live_price.py:160-168)
        return
    state.update((last_price, last_ts_us, n_ticks, min_price, max_price))
    yield pd.DataFrame(
        [
            {
                "symbol": symbol,
                "last_price": last_price,
                "last_ts_us": last_ts_us,
                "n_ticks": n_ticks,
                "min_price": min_price,
                "max_price": max_price,
            }
        ]
    )


def running_price_state(ticks_stream: DataFrame) -> DataFrame:
    """Per-symbol running snapshot (last/min/max price, tick count)
    maintained across micro-batches — the reference's ``current_prices``
    frame (update_live_price.py:69) as a durable streaming operator.

    Scale posture: state is partitioned by symbol (the natural key), one
    small fixed-size row per symbol; no skew beyond symbol popularity,
    which the state store shards with the shuffle.
    """
    return ticks_stream.groupBy("symbol").applyInPandasWithState(
        _update_running_state,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
