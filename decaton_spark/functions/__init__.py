from decaton_spark.functions import dedup, hashing, similarity, sketches, text

__all__ = ["dedup", "hashing", "similarity", "sketches", "text"]
