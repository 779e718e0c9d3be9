from .tables import TABLE_NAMES, read_table, register_views

__all__ = ["TABLE_NAMES", "read_table", "register_views"]
