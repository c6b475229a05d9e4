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


def make_token_bucket_fn(rate_per_s: float = 2.0, burst: float = 10.0, idle_ttl_ms: int = 0):
    """Build the stateful group function (rate = reference default 2 rps).

    ``idle_ttl_ms`` > 0 bounds total state: a host that receives no URLs for
    the TTL has its bucket REMOVED on processing-time timeout (it restarts
    with a fresh burst when it reappears — strictly more permissive, never a
    politeness violation). At web scale the key space is millions of hosts;
    without expiry the state store only ever grows."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        if idle_ttl_ms and state.hasTimedOut:
            state.remove()  # idle host: drop the bucket, nothing to emit
            yield pd.DataFrame([], columns=[f.name for f in OUTPUT_SCHEMA.fields])
            return
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
        if idle_ttl_ms:
            state.setTimeoutDuration(idle_ttl_ms)  # re-armed every batch seen
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return fn


def politeness_gate_stream(
    discoveries, rate_per_s: float = 2.0, burst: float = 10.0, idle_ttl_ms: int = 0
):
    """discoveries (streaming DF with host/url_canon/url_hash/discovered_ts) →
    admitted/deferred rows via per-host token-bucket state. ``idle_ttl_ms``
    enables processing-time state expiry for idle hosts (bounded state)."""
    from pyspark.sql import functions as F

    keyed = discoveries.select(
        "host",
        "url_canon",
        "url_hash",
        F.col("discovered_ts").cast("long").alias("event_epoch"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        make_token_bucket_fn(rate_per_s, burst, idle_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if idle_ttl_ms else GroupStateTimeout.NoTimeout
        ),
    )
