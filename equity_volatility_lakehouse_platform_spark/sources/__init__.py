from equity_volatility_lakehouse_platform_spark.sources.readers import load_table, load_tables

__all__ = ["load_table", "load_tables"]
