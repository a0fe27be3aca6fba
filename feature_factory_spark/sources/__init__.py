from .io import (
    compact_to,
    load_events,
    load_tables,
    read,
    read_media,
    write,
    write_bucketed,
)
from .warc import (edges_from_wat, make_http_response, make_warc,
                   make_wat, make_wet, parse_warc, read_warc)
