from dp3_spark.sources import mcap, multimodal

__all__ = ["mcap", "multimodal"]
