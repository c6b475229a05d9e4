"""Custom stateful streaming operator: per-host politeness token bucket.

The batch engine enforces politeness per round (operators.politeness). For the
CONTINUOUS ingest path this operator enforces it per micro-batch with
``applyInPandasWithState``: each host keys a GroupState holding
``(tokens, last_refill_epoch)``; tokens refill at the host's allowed rate and
each emitted URL spends one. URLs arriving while the bucket is empty are
emitted with ``admitted = false`` (callers route them back to the drop-zone /
next round rather than dropping them).

This is the applyInPandasWithState shape of the reference's rate limiter
(services/request_client.py:222-223 sleeps 1/rps before each request) — state
is per-key, bounded, and survives across micro-batches via the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url_canon", StringType()),
        StructField("url_hash", LongType()),
        StructField("event_epoch", LongType()),
        StructField("admitted", BooleanType()),
        StructField("tokens_after", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("tokens", DoubleType()), StructField("last_epoch", LongType())]
)


def make_token_bucket_fn(rate_per_s: float = 2.0, burst: float = 10.0):
    """Build the stateful group function (rate = reference default 2 rps)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            tokens, last_epoch = state.get
        else:
            tokens, last_epoch = burst, 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["event_epoch", "url_hash"])
            for _, row in pdf.iterrows():
                epoch = int(row["event_epoch"])
                tokens = min(burst, tokens + max(0, epoch - last_epoch) * rate_per_s)
                last_epoch = max(last_epoch, epoch)
                admitted = tokens >= 1.0
                if admitted:
                    tokens -= 1.0
                out.append(
                    (host, row["url_canon"], int(row["url_hash"]), epoch, admitted, tokens)
                )
        state.update((float(tokens), int(last_epoch)))
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return fn


def politeness_gate_stream(discoveries, rate_per_s: float = 2.0, burst: float = 10.0):
    """discoveries (streaming DF with host/url_canon/url_hash/discovered_ts) →
    admitted/deferred rows via per-host token-bucket state."""
    from pyspark.sql import functions as F

    keyed = discoveries.select(
        "host",
        "url_canon",
        "url_hash",
        F.col("discovered_ts").cast("long").alias("event_epoch"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        make_token_bucket_fn(rate_per_s, burst),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
