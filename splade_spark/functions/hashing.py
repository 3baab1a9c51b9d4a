"""Cross-engine deterministic hashing.

Spark's builtin ``hash``/``xxhash64`` are Murmur3/XXH64 with Spark's
seeding — not reproducible in DuckDB. Every hash the engine exposes
to an oracle-checked operator is therefore md5-derived: the first 8
hex chars of md5(s) as an unsigned 32-bit int. Identical in Spark
(``conv(substring(md5(s),1,8),16,10)``), DuckDB
(``('0x'||substr(md5(s),1,8))::BIGINT``), and Python
(``int(hashlib.md5(s).hexdigest()[:8], 16)``).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int(col: Column) -> Column:
    """Unsigned 32-bit int from md5 hex prefix; JVM-side."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_int_seeded(col: Column, seed: int) -> Column:
    return md5_int(F.concat(F.lit(f"{seed}:"), col))


def sql_md5_int(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def sql_md5_int_seeded(expr: str, seed: int) -> str:
    return sql_md5_int(f"'{seed}:' || {expr}")


def py_md5_int(s: str, seed: int | None = None) -> int:
    if seed is not None:
        s = f"{seed}:{s}"
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
