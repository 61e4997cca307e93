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


#: per-symbol EWMA snapshot emitted per micro-batch
EWMA_OUTPUT_SCHEMA = "symbol string, ewma double, last_ts_us long, n_ticks long"
#: persisted per-symbol EWMA state
EWMA_STATE_SCHEMA = "ewma double, last_ts_us long, n_ticks long"


def _make_ewma_update(alpha: float):
    a = float(alpha)
    b = 1.0 - a

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        (symbol,) = key
        if state.exists:
            ewma, last_ts_us, n_ticks = state.get
        else:
            ewma, last_ts_us, n_ticks = None, None, 0
        # deterministic fold order under replay: ONE (ts, price) sort
        # over the key's WHOLE micro-batch — Arrow chunk boundaries are
        # nondeterministic (maxRecordsPerBatch splits), so sorting each
        # chunk independently would fold in a chunk-dependent order and
        # an epoch replay could checkpoint a different state than the
        # original attempt
        chunks = [pdf.dropna(subset=["price", "ts"]) for pdf in pdf_iter]
        chunks = [c for c in chunks if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(["ts", "price"]).reset_index(drop=True)
            ts_us = (pdf["ts"].astype("int64") // 1000).astype("int64")
            for p in pdf["price"].to_numpy(dtype="float64"):
                # same fixed IEEE operand order as the batch kernel
                # (operators/analytics.ewma_closes)
                ewma = p if ewma is None else a * p + b * ewma
            n_ticks += len(pdf)
            last_ts_us = int(ts_us.max()) if last_ts_us is None else max(
                last_ts_us, int(ts_us.max())
            )
        if n_ticks == 0:
            return
        state.update((ewma, last_ts_us, n_ticks))
        yield pd.DataFrame(
            [
                {
                    "symbol": symbol,
                    "ewma": ewma,
                    "last_ts_us": last_ts_us,
                    "n_ticks": n_ticks,
                }
            ]
        )

    return update


def ewma_price_state(ticks_stream: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Per-symbol streaming EWMA (adjust=False recurrence) maintained
    across micro-batches — the live-indicator twin of
    ``operators/analytics.ewma_closes``: e ← α·p + (1−α)·e folded over
    each key's ticks in (ts, price) order, seeded at the first tick,
    state = one (ewma, last_ts_us, n_ticks) row per symbol in the
    checkpointed store.

    Semantics note: the recurrence is ORDER-SENSITIVE, so this
    operator defines its result over the observed per-batch-sorted
    sequence — late ticks fold in when they arrive (at their arrival
    position, weighted accordingly), which is the standard live-EMA
    behavior (a tick feed is near-ordered; compose with
    dedupe_ticks_with_watermark upstream for dup/lateness bounds).
    When batch boundaries respect event-time order the result is
    IDENTICAL to the batch kernel over the concatenated sequence —
    asserted in tests/test_stateful_streaming.py.

    Scale posture: state is one fixed-size row per symbol, partitioned
    on the natural key; each micro-batch touches only the keys present
    in it."""
    return ticks_stream.groupBy("symbol").applyInPandasWithState(
        _make_ewma_update(alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
