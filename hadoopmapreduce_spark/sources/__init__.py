from hadoopmapreduce_spark.sources.jsonlines import read_jsonlines_tolerant
from hadoopmapreduce_spark.sources.sinks import write_textkv

__all__ = ["read_jsonlines_tolerant", "write_textkv"]
