from .io import compact_to, load_events, load_tables, read, write, write_bucketed
