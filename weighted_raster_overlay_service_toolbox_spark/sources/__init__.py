"""Source/sink layer: fixture loaders and format round-trips."""

from .tables import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
