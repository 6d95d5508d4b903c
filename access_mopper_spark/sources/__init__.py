from access_mopper_spark.sources.readers import TABLES, load_table, load_tables, register_views  # noqa: F401
