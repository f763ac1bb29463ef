from hadoopmapreduce_spark.functions.numeric import dsum, davg

__all__ = ["dsum", "davg"]
