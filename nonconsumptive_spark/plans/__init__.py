from nonconsumptive_spark.plans.checkpoint import CheckpointCache

__all__ = ["CheckpointCache"]
