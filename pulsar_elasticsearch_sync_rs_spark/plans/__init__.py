from pulsar_elasticsearch_sync_rs_spark.plans.pipeline import etl_transform, flagship_summary

__all__ = ["etl_transform", "flagship_summary"]
