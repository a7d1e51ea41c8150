from nonconsumptive_spark.operators import wordcount

__all__ = ["wordcount"]
