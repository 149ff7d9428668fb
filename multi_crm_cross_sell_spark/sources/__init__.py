from .bronze import TESTDATA_TABLES, load_table, load_tables, with_lineage

__all__ = ["TESTDATA_TABLES", "load_table", "load_tables", "with_lineage"]
