"""Key hashing: salted xxhash64 URL keys + reference-parity MD5 row hashes.

- URL identity at 10^10 scale is a salted 64-bit xxhash of the canonical URL
  (native ``F.xxhash64`` — JVM-side, codegen'd). The salt defends against
  adversarial collision stuffing and lets the seen-set be re-keyed.
- Warehouse change-detection hashes reproduce the reference byte-for-byte:
  ``md5('_'.join(str(row[col]) for col in hash_cols))``
  (``utils/common/db_loader/data_loader.py:393-402``) — including pandas'
  ``str(None) == 'None'`` quirk, so SCD2 hash keys are comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SALT = "wcp-spark-v1"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_hash(url_canon: Column | str, salt: str = DEFAULT_SALT) -> Column:
    """Salted 64-bit key of a canonical URL. Native, codegen-friendly."""
    return F.xxhash64(F.lit(salt), _c(url_canon))


def bucket_of(hash_col: Column | str, num_buckets: int) -> Column:
    """Stable shard id for seen-set partitioning: pmod(hash, P)."""
    return F.pmod(_c(hash_col), F.lit(num_buckets)).cast("int")


def md5_row_hash(cols: list[str], null_repr: str = "None") -> Column:
    """MD5 over '_'-joined str() casts — parity with data_loader.py:393-402.

    ``concat_ws`` silently drops nulls, which would diverge from pandas
    ``str(None)``; coalesce each cast to ``null_repr`` first.
    """
    parts = [F.coalesce(_c(c).cast("string"), F.lit(null_repr)) for c in cols]
    return F.md5(F.concat_ws("_", *parts))


def variation_key(sku: Column | str, options: Column | str) -> Column:
    """Reference ``_get_variation_key`` (services/wayfair_service.py:166-194):
    ``"{sku}_{opt1}_{opt2}"`` with options array joined by '_'."""
    return F.concat_ws("_", _c(sku), F.array_join(_c(options), "_"))
