from .readers import load_table, read_aqi_csv_glob, read_counties_csv

__all__ = ["load_table", "read_aqi_csv_glob", "read_counties_csv"]
