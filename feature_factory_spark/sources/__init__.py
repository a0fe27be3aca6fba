from .io import load_tables, read, write
