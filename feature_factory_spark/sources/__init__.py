from .io import (
    compact_to,
    load_events,
    load_tables,
    read,
    read_media,
    write,
    write_bucketed,
)
