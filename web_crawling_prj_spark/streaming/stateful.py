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

import numpy as np
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
        # Vectorized recurrence. The bucket only refills when the epoch
        # ADVANCES, so the sequential part collapses to one O(1) step per
        # DISTINCT epoch: after refilling to t, a run of m same-epoch events
        # admits k = min(m, floor(t)) (admit while tokens ≥ 1, spending 1.0
        # each — float-exact for |t| ≤ burst), emitting t−(rank+1) for
        # admitted rows and t−k for denied ones. Per-event work (ranks,
        # admitted flags, tokens_after) is pure numpy; the Python loop is over
        # unique epochs only, never rows. Chunks are processed sequentially
        # carrying (tokens, last_epoch), exactly like the scalar original.
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["event_epoch", "url_hash"])
            epochs = pdf["event_epoch"].to_numpy(dtype=np.int64)
            uniq, grp_start, grp_n = np.unique(epochs, return_index=True, return_counts=True)
            k_g = np.empty(len(uniq), dtype=np.int64)
            tref_g = np.empty(len(uniq), dtype=np.float64)
            for gi in range(len(uniq)):
                e = int(uniq[gi])
                tokens = min(burst, tokens + max(0, e - last_epoch) * rate_per_s)
                last_epoch = max(last_epoch, e)
                k = min(int(grp_n[gi]), int(tokens)) if tokens >= 1.0 else 0
                tref_g[gi], k_g[gi] = tokens, k
                tokens -= k
            rank = np.arange(len(epochs)) - np.repeat(grp_start, grp_n)
            k_per = np.repeat(k_g, grp_n)
            tref = np.repeat(tref_g, grp_n)
            out.append(
                pd.DataFrame(
                    {
                        "host": host,
                        "url_canon": pdf["url_canon"].to_numpy(),
                        "url_hash": pdf["url_hash"].to_numpy(dtype=np.int64),
                        "event_epoch": epochs,
                        "admitted": rank < k_per,
                        "tokens_after": tref - np.minimum(rank + 1, k_per),
                    }
                )
            )
        state.update((float(tokens), int(last_epoch)))
        if idle_ttl_ms:
            state.setTimeoutDuration(idle_ttl_ms)  # re-armed every batch seen
        yield (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame([], columns=[f.name for f in OUTPUT_SCHEMA.fields])
        )

    return fn


def politeness_gate_stream(
    discoveries, rate_per_s: float = 2.0, burst: float = 10.0, idle_ttl_ms: int = 0
):
    """discoveries (streaming DF with host/url_canon/url_hash/discovered_ts) →
    admitted/deferred rows via per-host token-bucket state. ``idle_ttl_ms``
    enables processing-time state expiry for idle hosts (bounded state).

    Upstream contract: pass ``stream_frontier(..., dedup=False)`` — Spark
    disallows ``applyInPandasWithState`` after any other stateful operator,
    so the default ``dropDuplicatesWithinWatermark`` upstream fails the query
    at start; run the gate first and the authoritative dedup in the batch
    round (or a separate query). Rows with a NULL ``discovered_ts`` are
    dropped here (native filter): the timestamp IS the gate's clock, and a
    null would otherwise reach the state function as NaN and poison-pill the
    query (the same batch replays on every restart)."""
    from pyspark.sql import functions as F

    keyed = discoveries.where(F.col("discovered_ts").isNotNull()).select(
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
