"""Proxy pool management (SURVEY.md C6/C7, O2/O3).

Reference: utils/common/proxy_manager.py — fetch a pool of ~30 proxies,
health-check them all concurrently (:212-252), shuffle and truncate
(:127-129), rotate every 5 requests (request_client.py:269-275; rotation
itself lives in operators.politeness.proxy_slot).

Here the pool is a tiny DataFrame; the health fan-out is a mapInPandas probe
(the reference's asyncio.gather becomes partition-parallel batch I/O). The
sandbox has no network, so the probe callable is injectable and defaults to a
deterministic synthetic prober; the Spark plumbing (schema, fan-out, pool
filtering) is real.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def default_synthetic_prober(endpoints: pd.Series) -> pd.Series:
    """Deterministic fake health: ~80% of endpoints are 'up' by seeded hash."""
    import hashlib

    return endpoints.map(
        lambda e: int(hashlib.md5(f"probe:{e}".encode()).hexdigest(), 16) % 10 < 8
    )


def health_check_pool(
    proxies: DataFrame,
    prober: Callable[[pd.Series], pd.Series] | None = None,
    endpoint_col: str = "endpoint",
) -> DataFrame:
    """C7: fan-out health probe over the pool; keeps schema + adds healthy flag."""
    prober = prober or default_synthetic_prober
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in proxies.schema.fields)
    out_schema += ", healthy boolean"

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pdf.assign(healthy=prober(pdf[endpoint_col]).astype(bool))

    return proxies.mapInPandas(fn, schema=out_schema)


def validated_pool(
    proxies: DataFrame,
    limit: int = 30,
    seed: int = 42,
    prober: Callable[[pd.Series], pd.Series] | None = None,
) -> DataFrame:
    """Reference get-pool flow: health-check → seeded shuffle (O3:
    random.shuffle, proxy_manager.py:128 — here F.rand(seed) so it is
    reproducible) → take `limit` (O2) → assign stable slot ids for rotation."""
    healthy = health_check_pool(proxies, prober).where(F.col("healthy")).drop("healthy")
    # hash-ordered "shuffle", not F.rand: rand draws depend on partitioning, a
    # hash of the endpoint is a pure function of the data (sampling.py doctrine)
    order = [F.xxhash64(F.lit(seed), F.col("endpoint")), F.col("endpoint")]
    shuffled = healthy.orderBy(*order).limit(limit)
    return shuffled.withColumn(
        "proxy_slot", (F.row_number().over(Window.orderBy(*order)) - 1).cast("int")
    )
