from decaton_spark.functions import (
    dedup,
    hashing,
    quantize,
    ranking,
    similarity,
    sketches,
    text,
)

__all__ = [
    "dedup",
    "hashing",
    "quantize",
    "ranking",
    "similarity",
    "sketches",
    "text",
]
