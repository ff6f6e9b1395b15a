from .session import get_spark
from .catalog import TESTDATA_TABLES, register_testdata, table

__all__ = ["get_spark", "TESTDATA_TABLES", "register_testdata", "table"]
