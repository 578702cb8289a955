from operating_system_map_reduce_spark.sources.tables import load_events, load_table

__all__ = ["load_table", "load_events"]
