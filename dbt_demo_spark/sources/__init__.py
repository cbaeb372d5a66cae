from .parquet import TESTDATA_TABLES, load_table, load_tables, register_views
from .csv import read_seed_csv

__all__ = ["TESTDATA_TABLES", "load_table", "load_tables", "register_views",
           "read_seed_csv"]
