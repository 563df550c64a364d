"""ferrobus_spark: PySpark-native spatial-join + tiling engine."""
__version__ = "0.1.0"
