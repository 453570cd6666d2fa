from .catalog import TABLE_SCHEMAS, load_table, register_views, read_text_lines

__all__ = ["TABLE_SCHEMAS", "load_table", "register_views", "read_text_lines"]
