from .tables import load_table, load_tables, register_views  # noqa: F401
from .csv import read_csv_dir  # noqa: F401
from .jdbc import jdbc_reader  # noqa: F401
