from fugu_tpu.engine.dataset import Dataset, DatasetStats, FuguSearchResult
from fugu_tpu.engine.manager import DatasetManager

__all__ = ["Dataset", "DatasetStats", "DatasetManager", "FuguSearchResult"]
