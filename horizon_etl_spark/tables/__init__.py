from horizon_etl_spark.tables.lake import LakeTable

__all__ = ["LakeTable"]
