from pulsar_elasticsearch_sync_rs_spark.sources.batch import events_as_stream_records, read_table

__all__ = ["events_as_stream_records", "read_table"]
