from .readers import read_bronze_json, read_table  # noqa: F401
from .scd2 import Scd2Table  # noqa: F401
from .writers import write_parquet  # noqa: F401
