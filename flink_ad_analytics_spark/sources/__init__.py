from .batch import load_events, load_table, load_tables, register_views

__all__ = ["load_events", "load_table", "load_tables", "register_views"]
